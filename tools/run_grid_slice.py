"""Run ONE grid variant from scripts/train_grids.GRIDS over a p-slice.

Lets two sweep processes train the two p-shards of a grid concurrently:
the per-100-iter training program is partly dispatch-latency-bound over
the remote-TPU tunnel, so a second process overlaps its host phase with
the first's device phase (measured ~1.35x combined throughput on this
host, see CLAUDE.md).  The resume-blob tag embeds the p-slice, so a slice
run writes exactly the blob/checkpoints the full-grid queue expects and
the queue self-skips the completed shard.

Usage:
    python tools/run_grid_slice.py cdm_gt --p_list=0.22:0.40:0.02 \
        [--remat=True] [--sweep_shard=10]
"""
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main():
    name = sys.argv[1]
    extra = sys.argv[2:]
    from train_grids import GRIDS

    grids = dict(GRIDS)
    if name not in grids:
        raise SystemExit(f"unknown grid {name!r}; have {sorted(grids)}")
    argv = grids[name] + ["--sweep_shard=10"] + extra

    from ghm_tpu.train import sweep as sweep_cli

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    print(f"===== grid slice {name} {extra} =====", flush=True)
    sweep_cli.main(argv)
    print(f"===== grid slice {name} done =====", flush=True)


if __name__ == "__main__":
    main()
