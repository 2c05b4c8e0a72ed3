"""Analytic MFU estimates for the production programs (VERDICT r3 #4).

FLOP counts come from XLA's own HLO cost analysis of the *exact* jitted
train-step programs (``jit(f).lower(args).compile().cost_analysis()``),
built on the forced-CPU backend — the HLO flop count is a property of the
program, not of the chip it later runs on.  Achieved FLOP/s divides those
counts by the step times measured on the real chip (sources below), and
MFU divides by the v5e peak:

  * bf16 peak: 197 TFLOP/s (one MXU pass)
  * fp32 effective peak at ``jax_default_matmul_precision=highest`` (what
    every production program here runs): the MXU executes an f32xf32 matmul
    as 6 bf16 passes -> ~32.8 TFLOP/s

Measured ms/iter provenance (real chip, logs in repo):
  * clip_gt   : bench.py BENCH_PRECISION=highest round-4 A/B: 2,628.3
                samples/s at B=128 -> 48.7 ms.  (The headline BENCH runs at
                the platform DEFAULT precision — 30.0 ms, 4,265 samples/s —
                which must NOT be divided by the fp32-highest roof; the
                round-4 A/B in PARITY.md records both operating points.)
  * cdm_jt n5 : tools/profile_sweep_step.py chunk study 2026-08-21
                (logs_vlm_st_s2.log): 102.4 ms/iter, chunk-invariant
  * vlm_*     : live 30k-iter sweep logs (100-iter window timestamps,
                4 concurrent claim-holders — see CLAUDE.md round-3 notes)

Usage:  JAX_PLATFORMS=cpu python tools/mfu_report.py [--tasks ...]
Writes a markdown table to stdout; paste into PARITY.md / README.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

PEAK_BF16 = 197e12
PEAK_F32_HIGHEST = PEAK_BF16 / 6.0

# program -> (measured ms/iter on the real chip, batch samples/iter, source)
MEASURED = {
    "clip_gt_B128": (48.7, 128, "bench.py r4 precision A/B, highest leg"),
    "cdm_jt_n5": (102.4, 5 * 128, "chunk study r4, logs/profile_cdm_jt_chunks_r4.log"),
    "cdm_jt_n10": (226.0, 10 * 128, "round-3 sweep logs (2 concurrent)"),
    "vlm_jt_n10": (750.0, 10 * 128, "round-4 live sweep (5 concurrent)"),
    "vlm_st_n10": (271.0, 10 * 128, "round-3 live sweep log (4 concurrent)"),
    # vlm_gt n10 does NOT fit HBM un-rematerialized (compile OOM: 20.53G of
    # 15.75G, round-4 log) — remat is the production operating point.
    "vlm_gt_n10_remat": (790.0, 10 * 128, "round-4 live sweep (5 concurrent)"),
    "vlm_sh_n10": (54.0, 10 * 128, "round-4 live sweep (5 concurrent)"),
}


def clip_step_flops():
    """The bench.py guided-CLIP train step (chunk=1), lowered and counted."""
    from dataclasses import dataclass
    from typing import Optional

    from ghm_tpu.optim import adamw_init
    from ghm_tpu.train.tasks import build_clip_task
    from ghm_tpu.train.trainer import Trainer
    from ghm_tpu.utils.config import (ClipModelConfig, DoubleTreeConfig,
                                      UtilConfig)

    @dataclass
    class Cfg(UtilConfig, DoubleTreeConfig, ClipModelConfig):
        job_name: Optional[str] = "bench"

    cfg = Cfg(n_ttree_layer=4, n_itree_layer=4, n_ttree_child=3,
              n_itree_child=3, p_ttree_flip=0.2, p_itree_flip=0.2, K=4,
              batch_size=128, clip_tmodel_nlayer=5, clip_imodel_nlayer=5,
              clip_tmodel_deb=128, clip_imodel_deb=128, clip_layernorm=True,
              clip_attennorm=True, clip_guide=True, penalty=1e-3,
              lr_max=3e-4, lr_min=3e-7, total_iters=3000)
    task, _, _ = build_clip_task(cfg, n_bayes=2)
    trainer = Trainer(task, total_iters=cfg.total_iters, lr_max=cfg.lr_max,
                      lr_min=cfg.lr_min, max_norm=cfg.max_norm,
                      log_interval=1, seed=cfg.seed, bayes=task.bayes)
    params = task.init_fn(jax.random.PRNGKey(0))
    opt_state = adamw_init(params)
    run_chunk = trainer._build_chunk(1)
    return _flops(run_chunk, params, opt_state, 0, jax.random.PRNGKey(0))


def sweep_step_flops(task, n, remat=False):
    """One full vmapped sweep train step (sample+BP, fwd/bwd, clip, AdamW),
    exactly as tools/profile_sweep_step.py times it on hardware."""
    import jax.numpy as jnp

    from ghm_tpu.optim import adamw_init, adamw_update, lr_cosine_schedule
    from ghm_tpu.parallel.sweep import clip_per_model
    from tools.bench_sweep import BASE, build_spec

    base = dict(BASE)
    if remat:
        base["remat"] = True
    saved = dict(BASE)
    BASE.clear()
    BASE.update(base)
    try:
        p_list = [round(0.02 + 0.02 * i, 4) for i in range(n)]
        spec = build_spec(task, p_list)
    finally:
        BASE.clear()
        BASE.update(saved)

    vloss = jax.vmap(spec.loss_fn)

    def total_loss(p, b):
        losses, aux = vloss(p, b)
        return jnp.sum(losses), aux

    def step(params, opt_state, key):
        b = spec.sample_fn(key)
        (loss, aux), grads = jax.value_and_grad(total_loss, has_aux=True)(
            params, b)
        grads = clip_per_model(grads, 1.0)
        lr = lr_cosine_schedule(0, 1e-3, 1e-6, 0, 1000)
        params, opt_state = adamw_update(params, grads, opt_state, lr)
        return params, opt_state, loss

    init_keys = jax.random.split(jax.random.PRNGKey(224), n)
    params = jax.vmap(spec.init_fn)(init_keys)
    opt_state = adamw_init(params)
    return _flops(jax.jit(step), params, opt_state, jax.random.PRNGKey(0))


def _flops(jitted, *args):
    lowered = jitted.lower(*args)
    try:
        cost = lowered.compile().cost_analysis()
        kind = "compiled"
    except Exception:
        cost = lowered.cost_analysis()
        kind = "lowered"
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0]
    return float(cost["flops"]), kind


BUILDERS = {
    "clip_gt_B128": lambda: clip_step_flops(),
    "cdm_jt_n5": lambda: sweep_step_flops("cdm_jt", 5),
    "cdm_jt_n10": lambda: sweep_step_flops("cdm_jt", 10),
    "vlm_jt_n10": lambda: sweep_step_flops("vlm_jt", 10),
    "vlm_st_n10": lambda: sweep_step_flops("vlm_st", 10),
    "vlm_gt_n10_remat": lambda: sweep_step_flops("vlm_gt", 10, remat=True),
    "vlm_sh_n10": lambda: sweep_step_flops("vlm_sh", 10),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", default=",".join(BUILDERS))
    args = ap.parse_args()

    rows = []
    for name in args.tasks.split(","):
        ms, samples, src = MEASURED[name]
        flops, kind = BUILDERS[name]()
        achieved = flops / (ms / 1e3)
        rows.append((name, flops, ms, samples, achieved, src, kind))
        print(f"# {name}: {flops/1e9:.1f} GFLOP/iter ({kind})", flush=True)

    print()
    print("| program | GFLOP/iter | ms/iter (chip) | samples/s | achieved "
          "GFLOP/s | MFU vs bf16 peak | MFU vs fp32-highest peak |")
    print("|---|---|---|---|---|---|---|")
    for name, flops, ms, samples, achieved, src, kind in rows:
        print(f"| {name} | {flops/1e9:.1f} | {ms:.1f} | "
              f"{samples / (ms/1e3):,.0f} | {achieved/1e9:,.1f} | "
              f"{achieved/PEAK_BF16*100:.3f}% | "
              f"{achieved/PEAK_F32_HIGHEST*100:.2f}% |")
    print()
    for name, *_rest, src, kind in rows:
        print(f"  {name}: ms/iter source = {src} (flops: {kind})")


if __name__ == "__main__":
    main()
