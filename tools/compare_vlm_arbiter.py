"""Compare the reference VLM arbiter run (tools/train_reference_vlm.py ->
ref_vlm_train.npz) against ghm_tpu's joint-train VLM (NWP) loss curve at
p=0.2, using the reference trainers' logging convention (mean over the
window ``[it/2, it)``, reference training/train_NWP.py:166-167) so numbers
line up with both sides' training logs.

ghm_tpu side: reads ``loss_history``/``compare`` from the p=0.2 JT sweep
checkpoint (logs/VLM/K4_L4C3p20_L4C3p20sc10/JT_L9H4D256/*/checkpoint.pth)
when it exists, else the mid-sweep resume blob.

Usage: python tools/compare_vlm_arbiter.py [--ckpt path]
"""

import argparse
import glob
import os
import sys

import numpy as np

# The resume blob pickles ghm_tpu optimizer-state types.
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

NPZ = "/root/repo/ref_vlm_train.npz"
# Committed snapshot (tools/data/) used when the live arbiter npz is absent
# (workspace resets drop gitignored files).
NPZ_FALLBACK = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data", "ref_vlm_curve.npz")
DEFAULT_GLOB = ("/root/repo/logs/VLM/K4_L4C3p20_L4C3p20sc10/JT_L9H4D256/"
                "*/checkpoint.pth")
BLOB = "/root/repo/logs/VLM/.sweep_resume/nwp_JT_L9H4D256_p2-20_T30000.pkl"


def window(h, it):
    return float(np.mean(h[it // 2: it]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", default=None)
    args = parser.parse_args()

    candidates = [p for p in (NPZ, NPZ_FALLBACK) if os.path.exists(p)]
    if not candidates:
        raise SystemExit("no arbiter curve npz found; run "
                         "tools/train_reference_vlm.py first")
    d = max((np.load(p) for p in candidates), key=lambda x: int(x["upto"]))
    upto = int(d["upto"])
    print(f"reference arbiter: {upto} iters, Bayes {float(d['bayes']):.4f}")

    ckpt_path = args.ckpt or next(iter(sorted(glob.glob(DEFAULT_GLOB))), None)
    ours = None
    if ckpt_path and os.path.exists(ckpt_path):
        import torch

        payload = torch.load(ckpt_path, map_location="cpu",
                             weights_only=False)
        ours = {
            "loss": np.asarray(payload["loss_history"]),
            "compare": np.asarray(payload.get("compare", np.zeros(0))),
            "iter": int(payload["iter"]),
        }
        print(f"ghm_tpu JT checkpoint: {ckpt_path} (iter {ours['iter']})")
    elif os.path.exists(BLOB):
        # Mid-sweep fallback: per-model checkpoints are only written at
        # completion, but the resume blob carries running histories.
        import pickle

        with open(BLOB, "rb") as f:
            blob = pickle.load(f)
        idx = next(i for i, rd in enumerate(blob["run_dirs"])
                   if "p20_" in rd or "p20sc" in rd)
        ours = {
            "loss": np.asarray(blob["loss_hist"][idx]),
            "compare": (np.asarray(blob["compare_hist"][idx])
                        if blob.get("has_compare") else np.zeros(0)),
            "iter": int(blob["iter"]),
        }
        print(f"ghm_tpu JT from resume blob (iter {ours['iter']})")
    else:
        print("ghm_tpu JT p=0.2 checkpoint not found yet; showing the "
              "reference side only")

    # Dense early marks: the VLM arbiter is ~15-20 s/iter on this 1-core
    # host (the autoregressive D256 L9 fwd+bwd plus per-batch BP), so a
    # round's worth of run only reaches a few hundred iterations.
    marks = [100, 200, 300, 400, 600, 800, 1000, 1500, 2000, 3000, 5000,
             10000, 20000, 29900]
    print(f"{'iter':>6} {'ref loss':>9} {'ref cmp':>8} "
          f"{'ghm loss':>9} {'ghm cmp':>8}")
    for it in marks:
        if it > upto:
            break
        row = f"{it:>6} {window(d['hist'], it):>9.4f} " \
              f"{window(d['chist'], it):>8.4f}"
        if ours is not None and it <= ours["iter"]:
            row += f" {window(ours['loss'], it):>9.4f}"
            if ours["compare"].size:
                row += f" {window(ours['compare'], it):>8.4f}"
        print(row)


if __name__ == "__main__":
    main()
