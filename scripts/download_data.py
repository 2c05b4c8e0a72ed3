"""Download the Fig. 7 ImageNet similarity tensor from the Hugging Face Hub.

Counterpart of reference ``scripts/download_data.py``: fetches the gated
``BiasCLIP/BiasCLIP`` dataset's precomputed OpenCLIP RN50 ImageNet similarity
tensor (~14.9 GiB) into ``figures/data/imagenet-data/similarities_targets.pt``
for the Fig. 7 prompt-scaling analysis.  Requires accepting the dataset
license and a logged-in HF token.

Usage:
    python scripts/download_data.py [--check-only]
"""

import argparse
import os
import sys

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
DATASET = "BiasCLIP/BiasCLIP"
FILENAME = "similarities_targets.pt"
DEST = os.path.join(REPO_ROOT, "figures", "data", "imagenet-data")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--check-only", action="store_true",
                        help="preflight hub access and file metadata only")
    args = parser.parse_args()

    target = os.path.join(DEST, FILENAME)
    if os.path.exists(target):
        print(f"already present: {target} "
              f"({os.path.getsize(target) / 2**30:.1f} GiB)")
        return 0

    try:
        from huggingface_hub import HfApi, hf_hub_download
    except ImportError:
        print("huggingface_hub is not available in this environment", file=sys.stderr)
        return 1

    api = HfApi()
    try:
        info = api.repo_info(DATASET, repo_type="dataset")
    except Exception as exc:
        print(f"cannot reach the (gated) dataset {DATASET} ({exc}); "
              "Fig. 7 requires egress + an accepted license — all other "
              "figures are reproducible without it", file=sys.stderr)
        return 1
    print(f"dataset reachable: {info.id}")
    if args.check_only:
        return 0

    os.makedirs(DEST, exist_ok=True)
    path = hf_hub_download(DATASET, FILENAME, repo_type="dataset")
    # Hardlink into the canonical location when possible, else copy.
    try:
        os.link(path, target)
    except OSError:
        import shutil

        shutil.copy2(path, target)
    print(f"staged {target}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
