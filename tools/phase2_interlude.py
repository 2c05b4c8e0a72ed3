"""Phase-2 TPU interlude, run between the CLIP and CDM grid trainings in ONE
process (one TPU claim): Pallas tree-sampler A/B on hardware (VERDICT round-1
Weak #2), CDM sweep-rate probes at both matmul precisions (to pick the grid
precision), and the 30k-iteration CLIP provenance test (VERDICT Missing #4:
does a 10x budget reach the published 0.641 at p=0.2?).

Usage: python tools/phase2_interlude.py [--skip-pallas] [--skip-rates]
                                        [--skip-30k]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def rates_both_precisions():
    import jax
    import bench_sweep as B

    for prec in ("highest", "high"):
        jax.config.update("jax_default_matmul_precision", prec)
        for task in ("cdm_jt", "cdm_gt"):
            try:
                B.measure(task, 10, 60, 10)
                print(f"  ^ {task} n=10 at precision={prec}", flush=True)
            except Exception as exc:
                print(f"{task} precision={prec}: FAILED "
                      f"{type(exc).__name__}: {str(exc)[:300]}", flush=True)
    jax.config.update("jax_default_matmul_precision", "highest")


def provenance_30k():
    """Standard-TF CLIP at p=0.2, 30k iters (10x the committed budget)."""
    from ghm_tpu.train import train_CLIP

    t0 = time.time()
    train_CLIP.main([
        "--n_ttree_layer=4", "--n_itree_layer=4", "--n_ttree_child=3",
        "--n_itree_child=3", "--p_ttree_flip=0.2", "--p_itree_flip=0.2",
        "--flip_scale=1", "--batch_size=128", "--variable_type=10", "--K=4",
        "--clip_tmodel_nlayer=5", "--clip_imodel_nlayer=5",
        "--clip_tmodel_nhead=4", "--clip_imodel_nhead=4",
        "--clip_tmodel_deb=128", "--clip_imodel_deb=128",
        "--clip_layernorm=True", "--clip_attennorm=True",
        "--clip_guide=False", "--penalty=1e-3",
        "--lr_max=3e-4", "--lr_min=3e-7", "--total_iters=30000",
        "--eval_interval=2000", "--job_name=CLIP30K", "--raw=False",
    ])
    print(f"30k provenance run done in {time.time() - t0:.0f}s", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip-pallas", action="store_true")
    parser.add_argument("--skip-rates", action="store_true")
    parser.add_argument("--skip-30k", action="store_true")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    if not args.skip_pallas:
        from bench_phase2 import bench_pallas

        bench_pallas()
    if not args.skip_rates:
        rates_both_precisions()
    if not args.skip_30k:
        provenance_30k()


if __name__ == "__main__":
    main()
