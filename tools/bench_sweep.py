"""Measure steady-state per-iteration cost of the vmapped sweep programs.

For each requested (task, n_models) point, runs the real sweep program twice
(short and long, identical static shapes) and reports
``(t_long - t_short) / (iters_long - iters_short)`` so compile time and the
Bayes startup cancel.  Drives sharding/optimization decisions for the full
p-grids (VERDICT round-1, Missing #1).

Usage:
    python tools/bench_sweep.py --task cdm_jt --n 5 [--iters 80]
    python tools/bench_sweep.py --all
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from dataclasses import dataclass
from typing import Optional

from ghm_tpu.utils.config import (ClipModelConfig, DoubleTreeConfig,
                                  ModelConfig, UtilConfig)


@dataclass
class Cfg(UtilConfig, DoubleTreeConfig, ClipModelConfig, ModelConfig):
    job_name: Optional[str] = "bench"


BASE = dict(n_ttree_layer=4, n_itree_layer=4, n_ttree_child=3,
            n_itree_child=3, flip_scale=1.0, batch_size=128,
            variable_type=10, p_ttree_flip=0.2, p_itree_flip=0.2, K=4,
            sigma=1.0, raw=True)


def build_spec(task, p_list):
    from ghm_tpu.parallel.sweep import (cdns_sweep_spec, clip_sweep_spec,
                                        nwp_sweep_spec, sdns_sweep_spec,
                                        snwp_sweep_spec)

    if task.startswith("clip"):
        cfg = Cfg(**BASE, job_name="CLIP", clip_tmodel_nlayer=5,
                  clip_imodel_nlayer=5, clip_tmodel_deb=128,
                  clip_imodel_deb=128, clip_layernorm=True,
                  clip_attennorm=True, clip_guide=task.endswith("gt"))
        return clip_sweep_spec(cfg, p_list, "BENCH", n_bayes=64)
    if task in ("cdm_gt", "cdm_jt"):
        cfg = Cfg(**BASE, job_name="CDM", d_eb=128, n_model_layer=9,
                  layernorm=True, normalize_attn=True,
                  guide=task == "cdm_gt")
        return cdns_sweep_spec(cfg, p_list, "BENCH", n_bayes=64)
    if task in ("cdm_st", "cdm_sh"):
        cfg = Cfg(**BASE, job_name="CDM", d_eb=128,
                  n_model_layer=9 if task == "cdm_st" else 1,
                  layernorm=True, normalize_attn=True, guide=False)
        return sdns_sweep_spec(cfg, p_list, "BENCH", n_bayes=64)
    if task in ("vlm_gt", "vlm_jt"):
        cfg = Cfg(**BASE, job_name="VLM", d_eb=256, n_model_layer=9,
                  layernorm=True, normalize_attn=True,
                  guide=task == "vlm_gt")
        return nwp_sweep_spec(cfg, p_list, "BENCH", n_bayes=64)
    if task in ("vlm_st", "vlm_sh"):
        cfg = Cfg(**BASE, job_name="VLM", d_eb=256,
                  n_model_layer=9 if task == "vlm_st" else 1,
                  layernorm=True, normalize_attn=True, guide=False)
        return snwp_sweep_spec(cfg, p_list, "BENCH", n_bayes=64)
    raise SystemExit(f"unknown task {task}")


def measure(task, n, iters, log_interval=20):
    """Steady-state ms/iter from in-run progress timestamps (first logging
    window excluded, so compile + Bayes startup don't pollute the slope)."""
    import logging
    import re

    from ghm_tpu.parallel.sweep import run_sweep

    marks = []  # (iter, elapsed_seconds)

    class Capture(logging.Handler):
        def emit(self, record):
            m = re.search(r"iter (\d+)/\d+ .*\((\d+\.\d)s\)",
                          record.getMessage())
            if m:
                marks.append((int(m.group(1)), float(m.group(2))))

    logger = logging.getLogger("bench_sweep")
    logger.setLevel(logging.INFO)
    handler = Capture()
    logger.addHandler(handler)

    p_list = [round(0.02 + 0.02 * i, 4) for i in range(n)]
    spec = build_spec(task, p_list)
    # Progress lines are emitted every 5 chunks; make total span >= 3 marks.
    total = max(iters, log_interval * 15)
    run_sweep(spec, total_iters=total, lr_max=1e-3, lr_min=1e-6,
              log_interval=log_interval, seed=224, save=False, logger=logger)
    logger.removeHandler(handler)
    if len(marks) < 2:
        print(f"{task} n={n}: insufficient marks {marks}", flush=True)
        return None
    (i0, t0), (i1, t1) = marks[0], marks[-1]
    per_iter = (t1 - t0) / (i1 - i0)
    print(f"{task} n={n}: {per_iter * 1e3:.1f} ms/iter "
          f"({per_iter / n * 1e3:.2f} ms/model-iter; startup {t0:.1f}s to "
          f"iter {i0}; marks={marks})", flush=True)
    return per_iter


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", default="cdm_jt")
    parser.add_argument("--n", type=int, default=5)
    parser.add_argument("--iters", type=int, default=80)
    parser.add_argument("--log-interval", type=int, default=20)
    parser.add_argument("--all", action="store_true")
    parser.add_argument("--precision", default="highest",
                        choices=["default", "high", "highest"])
    parser.add_argument("--remat", action="store_true")
    args = parser.parse_args()

    import jax

    if args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)

    if args.remat:
        BASE["remat"] = True

    if args.all:
        for task in ("clip_gt", "cdm_jt", "cdm_st", "vlm_jt", "vlm_st"):
            for n in (5, 20):
                try:
                    measure(task, n, args.iters, args.log_interval)
                except Exception as exc:
                    print(f"{task} n={n}: FAILED "
                          f"{type(exc).__name__}: {str(exc)[:200]}",
                          flush=True)
    else:
        measure(args.task, args.n, args.iters, args.log_interval)


if __name__ == "__main__":
    main()
