"""The one in-process evaluation runner (single TPU claim).

``scripts/reproduce_eval.sh`` launches each ``figures/eval-*.py`` as its own
process, which is the reference's layout — but over the one-claim TPU relay
each process pays claim negotiation plus cold jit caches.  This runner stages
``logs/`` into ``checkpoints/`` (the eval scripts' input contract,
``ghm_tpu/eval/paths.py``) and executes the requested scripts sequentially
in-process, sharing the jitted BP/model executables across evals.

Usage:
    python tools/run_evals.py [stems ...] [--only clip-risk,...]
                              [--figures] [--no-stage]
e.g.
    python tools/run_evals.py eval-cdm-risk eval-vlm-risk --figures
    python tools/run_evals.py --only clip-ood,zsc-ood
Default with no stems/--only: the full 9-script eval set (risk + OOD +
numsamples), mirroring reference ``scripts/reproduce_eval.sh:42-54``.
"""

import argparse
import importlib.util
import os
import shutil
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "figures"))
os.chdir(REPO)

ALL_STEMS = [
    "eval-clip-risk",
    "eval-cdm-risk",
    "eval-vlm-risk",
    "eval-zsc-risk",
    "eval-zsc-numsamples",
    "eval-clip-ood",
    "eval-zsc-ood",
    "eval-cdm-ood",
    "eval-vlm-ood",
]


def run_script(stem, argv=()):
    path = os.path.join(REPO, "figures", stem + ".py")
    spec = importlib.util.spec_from_file_location(stem.replace("-", "_"), path)
    mod = importlib.util.module_from_spec(spec)
    # Scripts with their own argparse (plot_figures) read sys.argv; hide this
    # runner's flags from them.
    saved = sys.argv
    sys.argv = [path, *argv]
    try:
        spec.loader.exec_module(mod)
        mod.main()
    finally:
        sys.argv = saved


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


def stage():
    os.makedirs("checkpoints", exist_ok=True)
    for fam in ("CLIP", "CDM", "VLM"):
        if os.path.isdir(os.path.join("logs", fam)):
            shutil.copytree(os.path.join("logs", fam),
                            os.path.join("checkpoints", fam),
                            dirs_exist_ok=True, copy_function=_stage_copy,
                            ignore=_STAGE_IGNORE)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("stems", nargs="*",
                        help="eval script stems, e.g. eval-cdm-risk")
    parser.add_argument("--only", default=None,
                        help="comma-separated short names (e.g. clip-risk)")
    parser.add_argument("--figures", action="store_true",
                        help="render all figure PDFs afterwards")
    parser.add_argument("--no-stage", action="store_true",
                        help="skip the logs/ -> checkpoints/ staging pass")
    args = parser.parse_args(argv)

    stems = list(args.stems)
    if args.only:
        stems += ["eval-" + n.strip() for n in args.only.split(",") if n]
    if not stems:
        stems = ALL_STEMS

    if not args.no_stage:
        stage()
    for stem in stems:
        t0 = time.time()
        print(f"===== {stem} =====", flush=True)
        try:
            run_script(stem)
        except FileNotFoundError as exc:
            print(f"SKIPPED {stem}: missing checkpoints ({exc})", flush=True)
        print(f"===== {stem} done in {time.time() - t0:.0f}s =====",
              flush=True)

    if args.figures:
        print("===== plot_figures =====", flush=True)
        run_script("plot_figures")


if __name__ == "__main__":
    main()
