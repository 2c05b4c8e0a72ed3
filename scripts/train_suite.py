"""In-process training-suite driver.

Trains the full p_flip=0.20 model family (the Fig. 2 headline operating
point) in ONE Python process: on this machine the remote-TPU relay grants
one claim per process, so the bash-per-run pattern (reference
``reproduce_train.sh``) would renegotiate — and sometimes wedge — the claim
eleven times.  One process, one claim, eleven runs.

Usage:
    python scripts/train_suite.py [--p 0.2] [--precision highest|default]
                                  [--only clip_tf,clip_gt,...] [--iters-scale 1.0]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

TREE = ["--n_ttree_layer=4", "--n_itree_layer=4", "--n_ttree_child=3",
        "--n_itree_child=3", "--flip_scale=1", "--batch_size=128",
        "--variable_type=10"]


def runs(p, scale):
    def it(n):
        return str(max(1, int(n * scale)))

    pp = [f"--p_ttree_flip={p}", f"--p_itree_flip={p}"]
    clip_common = TREE + pp + [
        "--job_name=CLIP", "--K=4", "--clip_tmodel_nhead=4",
        "--clip_imodel_nhead=4", "--clip_tmodel_deb=128",
        "--clip_imodel_deb=128", "--clip_layernorm=True",
        "--clip_attennorm=True", "--penalty=1e-3", "--raw=False",
        "--wandb_logging=False", f"--total_iters={it(3000)}"]
    cdm_common = TREE + pp + [
        "--job_name=CDM", "--sigma=1", "--d_eb=128", "--n_head=4",
        "--layernorm=True", "--normalize_attn=True", "--penalty=0.1",
        "--raw=False", "--wandb_logging=False", f"--total_iters={it(30000)}"]
    vlm_common = TREE + pp + [
        "--job_name=VLM", "--d_eb=256", "--n_head=4", "--layernorm=True",
        "--normalize_attn=True", "--penalty=0.001", "--raw=False",
        "--wandb_logging=False", f"--total_iters={it(30000)}"]
    return [
        ("clip_tf", "train_CLIP", clip_common + [
            "--clip_tmodel_nlayer=5", "--clip_imodel_nlayer=5",
            "--clip_guide=False", "--lr_max=3e-4", "--lr_min=3e-7"]),
        ("clip_gt", "train_CLIP", clip_common + [
            "--clip_tmodel_nlayer=5", "--clip_imodel_nlayer=5",
            "--clip_guide=True", "--lr_max=1e-3", "--lr_min=1e-6"]),
        ("clip_sh", "train_CLIP", clip_common + [
            "--clip_tmodel_nlayer=1", "--clip_imodel_nlayer=1",
            "--clip_guide=False", "--lr_max=3e-4", "--lr_min=3e-7"]),
        ("cdm_gt", "train_CDNS", cdm_common + [
            "--n_model_layer=9", "--guide=True", "--lr_max=1e-2",
            "--lr_min=1e-5"]),
        ("cdm_jt", "train_CDNS", cdm_common + [
            "--n_model_layer=9", "--guide=False", "--lr_max=1e-3",
            "--lr_min=1e-6"]),
        ("cdm_st", "train_sequential_DNS", cdm_common + [
            "--clip_feature=TF", "--n_model_layer=9", "--guide=False",
            "--lr_max=1e-3", "--lr_min=1e-6"]),
        ("cdm_sh", "train_sequential_DNS", cdm_common + [
            "--clip_feature=TF", "--n_model_layer=1", "--guide=False",
            "--lr_max=1e-3", "--lr_min=1e-6"]),
        ("vlm_gt", "train_NWP", vlm_common + [
            "--n_model_layer=9", "--guide=True", "--lr_max=1e-3",
            "--lr_min=1e-6"]),
        ("vlm_jt", "train_NWP", vlm_common + [
            "--n_model_layer=9", "--guide=False", "--lr_max=3e-4",
            "--lr_min=3e-7"]),
        ("vlm_st", "train_sequential_NWP", vlm_common + [
            "--clip_feature=TF", "--n_model_layer=9", "--guide=False",
            "--lr_max=1e-3", "--lr_min=1e-6"]),
        ("vlm_sh", "train_sequential_NWP", vlm_common + [
            "--clip_feature=TF", "--n_model_layer=1", "--guide=False",
            "--lr_max=1e-3", "--lr_min=1e-6"]),
    ]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--p", type=float, default=0.2)
    parser.add_argument("--precision", default="highest",
                        choices=["default", "high", "highest"])
    parser.add_argument("--only", default=None)
    parser.add_argument("--iters-scale", type=float, default=1.0)
    parser.add_argument("--stage", action="store_true",
                        help="copy logs/{CLIP,CDM,VLM} -> checkpoints/ at end")
    args = parser.parse_args()

    import jax

    if args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)

    import importlib

    wanted = set(args.only.split(",")) if args.only else None
    for name, module, argv in runs(args.p, args.iters_scale):
        if wanted and name not in wanted:
            continue
        t0 = time.time()
        print(f"===== {name} ({module}) =====", flush=True)
        mod = importlib.import_module(f"ghm_tpu.train.{module}")
        mod.main(argv)
        print(f"===== {name} done in {time.time() - t0:.0f}s =====", flush=True)

    if args.stage:
        import shutil

        os.makedirs("checkpoints", exist_ok=True)
        for fam in ("CLIP", "CDM", "VLM"):
            if os.path.isdir(os.path.join("logs", fam)):
                shutil.copytree(os.path.join("logs", fam),
                                os.path.join("checkpoints", fam),
                                dirs_exist_ok=True)
        print("staged logs -> checkpoints", flush=True)


if __name__ == "__main__":
    main()
