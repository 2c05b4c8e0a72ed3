"""Full-grid sweep driver: train the remaining p=0.02..0.40 experiment grids
sequentially in ONE process (the TPU relay grants one claim per process, so
background shells — the reference's pattern, ``scripts/experiments/exp_*.sh``
— would wedge the claim here; see CLAUDE.md).

Each variant is a vmapped multi-model sweep (``ghm_tpu.train.sweep``) with
resume enabled: killing this process loses at most one eval interval, and a
relaunch continues every unfinished shard from its resume blob and skips
completed ones.

Usage:
    python scripts/train_grids.py [--only clip_gt,cdm_st,...]
                                  [--sweep-shard 5] [--precision highest]
                                  [--stop-after N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

TREE = ["--n_ttree_layer=4", "--n_itree_layer=4", "--n_ttree_child=3",
        "--n_itree_child=3", "--flip_scale=1", "--batch_size=128",
        "--variable_type=10", "--p_list=0.02:0.40:0.02", "--raw=False"]

CLIP = TREE + ["--task=clip", "--job_name=CLIP", "--K=4",
               "--clip_tmodel_nlayer=5", "--clip_imodel_nlayer=5",
               "--clip_tmodel_nhead=4", "--clip_imodel_nhead=4",
               "--clip_tmodel_deb=128", "--clip_imodel_deb=128",
               "--clip_layernorm=True", "--clip_attennorm=True",
               "--penalty=1e-3", "--total_iters=3000"]

# eval_interval=1000: resume-blob writes cost a bulk device→host fetch each;
# at the reference's 200 a 30k-iter shard would spend minutes just fetching.
CDM = TREE + ["--job_name=CDM", "--sigma=1", "--d_eb=128", "--n_head=4",
              "--layernorm=True", "--normalize_attn=True", "--penalty=0.1",
              "--total_iters=30000", "--eval_interval=1000"]

VLM = TREE + ["--job_name=VLM", "--d_eb=256", "--n_head=4",
              "--layernorm=True", "--normalize_attn=True", "--penalty=0.001",
              "--total_iters=30000", "--eval_interval=1000"]

# Priority order: the three CLIP grids come first (the sequential CDM/VLM
# sweeps load the frozen per-p Standard-TF CLIP encoders, and clip-risk.json /
# zsc-risk.json consume all three); CDM grids unblock cdm-risk.json; VLM
# grids vlm-risk.json.  Variant configs mirror reference
# scripts/experiments/exp_*.sh exactly.
GRIDS = [
    ("clip_st", CLIP + ["--clip_guide=False", "--lr_max=3e-4",
                        "--lr_min=3e-7"]),
    ("clip_sh", [a for a in CLIP if "nlayer" not in a]
     + ["--clip_tmodel_nlayer=1", "--clip_imodel_nlayer=1",
        "--clip_guide=False", "--lr_max=3e-4", "--lr_min=3e-7"]),
    ("clip_gt", CLIP + ["--clip_guide=True", "--lr_max=1e-3",
                        "--lr_min=1e-6"]),
    # Provenance test (VERDICT round-1 Missing #4): does a 10x iteration
    # budget bring standard-TF CLIP at p=0.2 to the published 0.641 tail?
    # Separate job dir so eval scans of logs/CLIP never see it.
    ("clip_30k", [a for a in CLIP if not a.startswith(("--p_list",
                                                       "--total_iters",
                                                       "--job_name"))]
     + ["--p_list=0.2", "--total_iters=30000", "--job_name=CLIP30K",
        "--clip_guide=False", "--lr_max=3e-4", "--lr_min=3e-7",
        "--eval_interval=2000"]),
    ("cdm_st", CDM + ["--task=sdns", "--clip_feature=TF",
                      "--n_model_layer=9", "--guide=False",
                      "--lr_max=1e-3", "--lr_min=1e-6"]),
    ("cdm_sh", CDM + ["--task=sdns", "--clip_feature=TF",
                      "--n_model_layer=1", "--guide=False",
                      "--lr_max=1e-3", "--lr_min=1e-6"]),
    # jt before gt: at measured shard rates (st 153 ms/iter, jt ~0.93x,
    # gt ~1.24x of that) jt is the heavy grid that can still finish inside a
    # round window; gt resumes next round from its blob.
    ("cdm_jt", CDM + ["--task=cdns", "--n_model_layer=9", "--guide=False",
                      "--lr_max=1e-3", "--lr_min=1e-6"]),
    ("cdm_gt", CDM + ["--task=cdns", "--n_model_layer=9", "--guide=True",
                      "--lr_max=1e-2", "--lr_min=1e-5"]),
    ("vlm_jt", VLM + ["--task=nwp", "--n_model_layer=9", "--guide=False",
                      "--lr_max=3e-4", "--lr_min=3e-7"]),
    ("vlm_st", VLM + ["--task=snwp", "--clip_feature=TF",
                      "--n_model_layer=9", "--guide=False",
                      "--lr_max=1e-3", "--lr_min=1e-6"]),
    ("vlm_sh", VLM + ["--task=snwp", "--clip_feature=TF",
                      "--n_model_layer=1", "--guide=False",
                      "--lr_max=1e-3", "--lr_min=1e-6"]),
    # Guided VLM last: the per-position autoregressive BP guides make it the
    # most expensive grid; with sweep resume it survives a round boundary.
    ("vlm_gt", VLM + ["--task=nwp", "--n_model_layer=9", "--guide=True",
                      "--lr_max=1e-3", "--lr_min=1e-6"]),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--only", default=None,
                        help="comma-separated variant names")
    parser.add_argument("--sweep-shard", type=int, default=5)
    parser.add_argument("--precision", default="highest",
                        choices=["default", "high", "highest"])
    parser.add_argument("--stop-after", type=int, default=0,
                        help="pause each shard (resumable) after N iters")
    parser.add_argument("--remat", action="store_true",
                        help="per-layer rematerialization (bigger shards)")
    args = parser.parse_args()

    import jax

    if args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)

    from ghm_tpu.train import sweep as sweep_cli

    wanted = set(args.only.split(",")) if args.only else None
    for name, argv in GRIDS:
        if wanted and name not in wanted:
            continue
        full = argv + [f"--sweep_shard={args.sweep_shard}"]
        if args.stop_after:
            full += [f"--stop_after={args.stop_after}"]
        if args.remat:
            full += ["--remat=True"]
        t0 = time.time()
        print(f"===== grid {name} =====", flush=True)
        sweep_cli.main(full)
        print(f"===== grid {name} done in {time.time() - t0:.0f}s =====",
              flush=True)


if __name__ == "__main__":
    main()
