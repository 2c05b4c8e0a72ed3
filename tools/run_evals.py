"""Run the evaluation scripts in one process (one TPU claim).

Stages logs/ -> checkpoints/ and executes the requested figures/eval-*.py
scripts in-process.  On one-claim-per-process TPU relays (CLAUDE.md) this is
the reliable way to run the whole evaluation pipeline.

Usage:
    python tools/run_evals.py [script-stem ...]   # default: OOD set
e.g.
    python tools/run_evals.py eval-clip-ood eval-zsc-ood eval-cdm-ood eval-vlm-ood
"""

import importlib.util
import os
import shutil
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "figures"))
os.chdir(REPO)

DEFAULT = ["eval-clip-ood", "eval-zsc-ood", "eval-cdm-ood", "eval-vlm-ood"]


def run_script(stem):
    path = os.path.join(REPO, "figures", stem + ".py")
    spec = importlib.util.spec_from_file_location(stem.replace("-", "_"), path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


def _stage_copy(src, dst, *, follow_symlinks=True):
    # Prior stagings may have hardlinked checkpoints; copying a file onto
    # itself raises SameFileError, so leave identical files in place.
    if os.path.exists(dst) and os.path.samefile(src, dst):
        return dst
    try:
        return shutil.copy2(src, dst, follow_symlinks=follow_symlinks)
    except FileNotFoundError:
        # Live sweeps publish atomically (tmp + os.replace); a tmp file can
        # vanish between copytree's listdir and the copy.  Evals only need
        # checkpoint.pth, so a vanished transient is safe to skip.
        return dst


# Resume blobs and in-flight atomic-write temporaries are trainer state, not
# eval inputs; excluding them keeps staging race-free alongside live sweeps.
_STAGE_IGNORE = shutil.ignore_patterns(".sweep_resume", "*.tmp")


def main():
    os.makedirs("checkpoints", exist_ok=True)
    for fam in ("CLIP", "CDM", "VLM"):
        if os.path.isdir(os.path.join("logs", fam)):
            shutil.copytree(os.path.join("logs", fam),
                            os.path.join("checkpoints", fam),
                            dirs_exist_ok=True, copy_function=_stage_copy,
                            ignore=_STAGE_IGNORE)
    stems = sys.argv[1:] or DEFAULT
    for stem in stems:
        t0 = time.time()
        print(f"===== {stem} =====", flush=True)
        run_script(stem)
        print(f"===== {stem} done in {time.time() - t0:.0f}s =====", flush=True)


if __name__ == "__main__":
    main()
