"""Headline benchmark: guided-CLIP training throughput on TPU.

Measures the full ghm_tpu training step at the paper's flagship operating
point — ClipSampler(L=4, C=3, p_flip=0.2, K=4, B=128) with exact BP guide
targets, dual L5/H4/D128 encoders, GuidedClipLoss, grad clip + cosine LR +
AdamW — where sampling, inference targets, and the update are ONE compiled
XLA program running entirely on device.

Baseline: the reference implementation's identical training step
(torch/numpy, /root/reference) measured on this host via
tools/bench_reference.py: 22.73 s/step = 5.63 samples/s (its per-node
Python BP sampler dominates; the model fwd/bwd is a small fraction).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax

# Reference torch/numpy pipeline, same step on this host (tools/bench_reference.py).
REFERENCE_SAMPLES_PER_SEC = 5.63

BATCH = 128
N_WARMUP_CHUNKS = 2
N_CHUNKS = 5
# Scan-chunk length: each host dispatch runs CHUNK fused train steps on
# device.  The round-4 chunk study (logs/profile_clip_gt_r4.log) measured
# per-iter time chunk-invariant from 1 to 100 — async dispatch already
# hides the remote-tunnel latency — so CHUNK only sets the log cadence.
CHUNK = int(os.environ.get("BENCH_CHUNK", "10"))
# Matmul precision operating point.  Unset = JAX's platform default, the
# operating point every recorded BENCH_r0N ran at.  The production sweep
# programs pin "highest" (f32 matmuls as 6 bf16 MXU passes — reproduces the
# reference's fp32 training curves); BENCH_PRECISION={highest,default}
# makes the bench measure either point explicitly.
PRECISION = os.environ.get("BENCH_PRECISION")


def main():
    if PRECISION:
        jax.config.update("jax_default_matmul_precision", PRECISION)
    from ghm_tpu.train.tasks import build_clip_task
    from ghm_tpu.train.trainer import Trainer
    from ghm_tpu.utils.config import ClipModelConfig, DoubleTreeConfig, UtilConfig
    from dataclasses import dataclass
    from typing import Optional

    @dataclass
    class Cfg(UtilConfig, DoubleTreeConfig, ClipModelConfig):
        job_name: Optional[str] = "bench"

    cfg = Cfg(n_ttree_layer=4, n_itree_layer=4, n_ttree_child=3,
              n_itree_child=3, p_ttree_flip=0.2, p_itree_flip=0.2, K=4,
              batch_size=BATCH, clip_tmodel_nlayer=5, clip_imodel_nlayer=5,
              clip_tmodel_deb=128, clip_imodel_deb=128, clip_layernorm=True,
              clip_attennorm=True, clip_guide=True, penalty=1e-3,
              lr_max=3e-4, lr_min=3e-7, total_iters=3000)

    task, _, _ = build_clip_task(cfg, n_bayes=2000)
    trainer = Trainer(task, total_iters=cfg.total_iters, lr_max=cfg.lr_max,
                      lr_min=cfg.lr_min, max_norm=cfg.max_norm,
                      log_interval=CHUNK, seed=cfg.seed, bayes=task.bayes)
    params = task.init_fn(jax.random.PRNGKey(cfg.seed))
    from ghm_tpu.optim import adamw_init

    opt_state = adamw_init(params)
    run_chunk = trainer._build_chunk(CHUNK)
    key = jax.random.PRNGKey(0)

    it = 0
    for _ in range(N_WARMUP_CHUNKS):
        params, opt_state, aux = run_chunk(params, opt_state, it, key)
        it += CHUNK
    jax.block_until_ready(aux)

    t0 = time.perf_counter()
    for _ in range(N_CHUNKS):
        params, opt_state, aux = run_chunk(params, opt_state, it, key)
        it += CHUNK
    jax.block_until_ready(aux)
    dt = (time.perf_counter() - t0) / (N_CHUNKS * CHUNK)

    samples_per_sec = BATCH / dt
    # chunk is part of the operating point (dispatch amortization), so a
    # non-default BENCH_CHUNK must be visible in the record — results from
    # different chunks are otherwise silently non-comparable.
    out = {
        "metric": "guided_clip_train_samples_per_sec",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / REFERENCE_SAMPLES_PER_SEC, 2),
        # From XLA's HLO flop count of this exact step program
        # (654.4 GFLOP/iter, tools/mfu_report.py `clip_gt_B128`, compiled
        # cost_analysis).  v5e bf16 peak 197 TFLOP/s; at
        # matmul_precision=highest an f32 matmul costs 6 bf16 passes, so the
        # effective peak is 197/6 — report MFU against that roof only when
        # this run actually pinned `highest`.
        "achieved_tflops": round(654.4e9 / dt / 1e12, 2),
        "mfu_vs_bf16_peak": round((654.4e9 / dt) / 197e12, 4),
    }
    if PRECISION == "highest":
        out["mfu_vs_fp32_highest_peak"] = round(
            (654.4e9 / dt) / (197e12 / 6.0), 4)
    if CHUNK != 10:
        out["chunk"] = CHUNK
    if PRECISION:
        out["matmul_precision"] = PRECISION
    print(json.dumps(out))


if __name__ == "__main__":
    main()
