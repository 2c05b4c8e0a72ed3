"""Decompose a sweep step's cost: sampling+BP targets vs model fwd/bwd+update.

Times three jitted programs at the same shapes (steady state, 30 reps each):
  * sample:  the vmapped on-device batch generation (trees + BP targets)
  * fwdbwd:  value_and_grad of the vmapped loss on a fixed batch
  * step:    the full training step (sample + fwdbwd + clip + AdamW)

Also measures dispatch-amortization: the same step run as jitted
``lax.scan`` chunks of several lengths (``--chunks 1,20,100``), reported as
ms/iter — over the remote-TPU tunnel the per-dispatch latency dominates
small programs, so per-iter time falling with chunk length quantifies the
"dispatch-bound" claim (PARITY.md "Performance").  ``--trace DIR`` wraps
the timed region in ``jax.profiler.trace`` for a TensorBoard-loadable
timeline.

Usage: python tools/profile_sweep_step.py --task cdm_jt --n 5 [--remat]
                                          [--chunks 1,20,100] [--trace DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def timeit(fn, *args, reps=30):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", default="cdm_jt")
    parser.add_argument("--n", type=int, default=5)
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--precision", default="highest",
                        choices=["default", "high", "highest"])
    parser.add_argument("--chunks", default=None,
                        help="comma-separated scan-chunk lengths to time "
                             "(e.g. 1,20,100)")
    parser.add_argument("--trace", default=None,
                        help="directory for a jax.profiler trace of the "
                             "timed region")
    args = parser.parse_args()

    import jax

    if args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)

    import jax.numpy as jnp

    from ghm_tpu.optim import adamw_init, adamw_update, lr_cosine_schedule
    from ghm_tpu.parallel.sweep import clip_per_model
    from tools.bench_sweep import BASE, build_spec

    if args.remat:
        BASE["remat"] = True
    p_list = [round(0.02 + 0.02 * i, 4) for i in range(args.n)]
    spec = build_spec(args.task, p_list)

    sample = jax.jit(spec.sample_fn)
    key = jax.random.PRNGKey(0)
    batch = jax.block_until_ready(sample(key))

    vloss = jax.vmap(spec.loss_fn)

    def total_loss(p, b):
        losses, aux = vloss(p, b)
        return jnp.sum(losses), aux

    grad_fn = jax.jit(jax.value_and_grad(total_loss, has_aux=True))
    init_keys = jax.random.split(jax.random.PRNGKey(224), args.n)
    params = jax.vmap(spec.init_fn)(init_keys)
    opt_state = adamw_init(params)

    @jax.jit
    def step(params, opt_state, key):
        b = spec.sample_fn(key)
        (loss, aux), grads = jax.value_and_grad(total_loss, has_aux=True)(
            params, b)
        grads = clip_per_model(grads, 1.0)
        lr = lr_cosine_schedule(0, 1e-3, 1e-6, 0, 1000)
        params, opt_state = adamw_update(params, grads, opt_state, lr)
        return params, opt_state, loss

    import contextlib

    trace_cm = (jax.profiler.trace(args.trace) if args.trace
                else contextlib.nullcontext())
    with trace_cm:
        t_sample = timeit(sample, key)
        t_fwdbwd = timeit(grad_fn, params, batch)
        t_step = timeit(lambda: step(params, opt_state, key), reps=30)
    print(f"{args.task} n={args.n} remat={args.remat} "
          f"precision={args.precision}:")
    print(f"  sample+BP : {t_sample * 1e3:8.1f} ms")
    print(f"  fwd+bwd   : {t_fwdbwd * 1e3:8.1f} ms")
    print(f"  full step : {t_step * 1e3:8.1f} ms")

    if args.chunks:
        def make_chunk(n_steps):
            @jax.jit
            def run(params, opt_state, key):
                def body(carry, i):
                    p, o = carry
                    k = jax.random.fold_in(key, i)
                    b = spec.sample_fn(k)
                    (loss, aux), grads = jax.value_and_grad(
                        total_loss, has_aux=True)(p, b)
                    grads = clip_per_model(grads, 1.0)
                    lr = lr_cosine_schedule(0, 1e-3, 1e-6, 0, 1000)
                    p, o = adamw_update(p, grads, o, lr)
                    return (p, o), loss

                (p, o), losses = jax.lax.scan(body, (params, opt_state),
                                              jnp.arange(n_steps))
                return p, o, losses

            return run

        for c in [int(x) for x in args.chunks.split(",")]:
            run = make_chunk(c)
            t_c = timeit(run, params, opt_state, key,
                         reps=max(1, 300 // c))
            print(f"  scan chunk {c:4d}: {t_c / c * 1e3:8.2f} ms/iter "
                  f"({t_c * 1e3:.0f} ms/dispatch)")


if __name__ == "__main__":
    main()
