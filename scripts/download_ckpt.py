"""Download released checkpoints from the Hugging Face Hub.

Counterpart of reference ``scripts/download_ckpt.py``: snapshot-downloads the
``logs/**`` tree of the released checkpoint repository and stages it under
``checkpoints/`` in the layout the evaluation scripts expect.  Because the
released ``.pth`` files use the same schema as ghm_tpu checkpoints, they load
directly into this framework's models via
``ghm_tpu.utils.torch_interop.params_from_state_dict``.

Usage:
    python scripts/download_ckpt.py [--repo faro1219/multimodal-ghm]
                                    [--dest checkpoints] [--dry-run]
"""

import argparse
import os
import shutil
import sys

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
DEFAULT_REPO = "faro1219/multimodal-ghm"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--repo", default=DEFAULT_REPO)
    parser.add_argument("--dest", default=os.path.join(REPO_ROOT, "checkpoints"))
    parser.add_argument("--dry-run", action="store_true",
                        help="preflight: check hub reachability, list files, "
                             "download nothing")
    args = parser.parse_args()

    try:
        from huggingface_hub import HfApi, snapshot_download
    except ImportError:
        print("huggingface_hub is not available in this environment", file=sys.stderr)
        return 1

    api = HfApi()
    try:
        files = [f for f in api.list_repo_files(args.repo, repo_type="model")
                 if f.startswith("logs/")]
    except Exception as exc:
        print(f"cannot reach the Hugging Face Hub ({exc}); "
              "this environment may have no egress — train checkpoints "
              "locally with scripts/reproduce_train.sh instead", file=sys.stderr)
        return 1
    print(f"{len(files)} checkpoint files under logs/ in {args.repo}")
    if args.dry_run:
        for f in files[:20]:
            print(" ", f)
        return 0

    local = snapshot_download(args.repo, repo_type="model",
                              allow_patterns=["logs/**"])
    # Stage logs/<FAMILY>/... -> checkpoints/<FAMILY>/...
    os.makedirs(args.dest, exist_ok=True)
    staged = 0
    src_logs = os.path.join(local, "logs")
    for fam in sorted(os.listdir(src_logs)):
        dst = os.path.join(args.dest, fam)
        shutil.copytree(os.path.join(src_logs, fam), dst, dirs_exist_ok=True)
        staged += 1
    print(f"staged {staged} checkpoint families into {args.dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
