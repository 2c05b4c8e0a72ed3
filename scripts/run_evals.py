"""Run every figure-eval script in ONE process (single TPU claim).

``scripts/reproduce_eval.sh`` launches each ``figures/eval-*.py`` as its own
process, which is the reference's layout — but over the one-claim TPU relay
each process pays claim negotiation plus cold jit caches.  This runner
executes the same scripts sequentially in-process, sharing the jitted BP/
model executables across evals.

Usage:
    python scripts/run_evals.py [--only clip-risk,zsc-risk,...] [--figures]
"""

import argparse
import os
import runpy
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "figures"))

EVALS = [
    "eval-clip-risk.py",
    "eval-cdm-risk.py",
    "eval-vlm-risk.py",
    "eval-zsc-risk.py",
    "eval-zsc-numsamples.py",
    "eval-clip-ood.py",
    "eval-zsc-ood.py",
    "eval-cdm-ood.py",
    "eval-vlm-ood.py",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--only", default=None,
                        help="comma-separated eval names (e.g. clip-risk)")
    parser.add_argument("--figures", action="store_true",
                        help="render all figure PDFs afterwards")
    args = parser.parse_args()
    wanted = set(args.only.split(",")) if args.only else None

    os.chdir(REPO)
    for script in EVALS:
        name = script.replace("eval-", "").replace(".py", "")
        if wanted and name not in wanted:
            continue
        t0 = time.time()
        print(f"=== {script} ===", flush=True)
        try:
            runpy.run_path(os.path.join(REPO, "figures", script),
                           run_name="__main__")
        except FileNotFoundError as exc:
            print(f"SKIPPED {script}: missing checkpoints ({exc})",
                  flush=True)
        print(f"=== {script} done in {time.time() - t0:.0f}s ===", flush=True)

    if args.figures:
        print("=== plot_figures.py ===", flush=True)
        runpy.run_path(os.path.join(REPO, "figures", "plot_figures.py"),
                       run_name="__main__")


if __name__ == "__main__":
    main()
