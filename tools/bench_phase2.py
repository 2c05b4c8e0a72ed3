"""Round-2 phase-2 micro-benches, run on the real TPU between grid trainings.

1. Pallas fused tree-sampler vs the XLA path (``core.tree.sample_tree``)
   compiled on hardware — the measurement VERDICT round-1 asked for
   (Weak #2): wire it in on a win, or record the loss and keep it as an
   op-level experiment.
2. Post-BP-skip sweep step rates for the CDM/VLM grid variants, to budget
   the 30k-iter full-grid queue.

Usage: python tools/bench_phase2.py [--skip-pallas] [--skip-rates]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def bench_pallas():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ghm_tpu.core import gen_transition, transitions_to_device
    from ghm_tpu.core.tree import sample_root, sample_tree
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "experiments"))
    from tree_sampler_pallas import sample_tree_pallas

    transitions = transitions_to_device(
        gen_transition(4, 3, 10, 0.2, rng=np.random.RandomState(42)))
    B = 1280  # the guided-CLIP step's per-model tree count

    def run(fn, tag):
        def wrapped(k):
            kr, kt = jax.random.split(k)
            root = sample_root(kr, B, 10)
            return fn(kt, transitions, B, root)

        f = jax.jit(wrapped)
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        out = jax.block_until_ready(f(key))
        compile_s = time.time() - t0
        reps = 50
        t0 = time.time()
        for i in range(reps):
            out = jax.block_until_ready(f(jax.random.fold_in(key, i)))
        per = (time.time() - t0) / reps
        print(f"pallas-ab {tag}: {per * 1e3:.2f} ms/call "
              f"(compile {compile_s:.1f}s)", flush=True)
        return per, out

    def xla_fn(key, transitions, batch, root):
        return sample_tree(key, transitions, batch, root=root)[-1]

    def pallas_fn(key, transitions, batch, root):
        return sample_tree_pallas(key, transitions, batch, root)[-1]

    t_xla, v_xla = run(xla_fn, "xla ")
    try:
        # Key-split order differs (core splits per layer, the kernel draws
        # one uniform block), so compare distributions, not bits; exactness
        # on shared uniforms is covered by tests/test_ops.py.
        t_pl, v_pl = run(pallas_fn, "pallas")
        mx = float(jnp.abs(jnp.mean(v_xla.astype(jnp.float32), axis=0)
                           - jnp.mean(v_pl.astype(jnp.float32), axis=0)).max())
        print(f"pallas-ab: max leaf-mean delta {mx:.3f}, "
              f"speedup xla/pallas = {t_xla / t_pl:.2f}x", flush=True)
    except Exception as exc:  # compile failure is itself a result
        print(f"pallas-ab: pallas path FAILED on hardware: "
              f"{type(exc).__name__}: {str(exc)[:300]}", flush=True)


def bench_rates():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_sweep as B

    for task, n in (("cdm_jt", 10), ("cdm_st", 10), ("vlm_jt", 10),
                    ("vlm_gt", 10), ("vlm_st", 10)):
        try:
            B.measure(task, n, 80, 20)
        except Exception as exc:
            print(f"{task} n={n}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip-pallas", action="store_true")
    parser.add_argument("--skip-rates", action="store_true")
    args = parser.parse_args()
    if not args.skip_pallas:
        bench_pallas()
    if not args.skip_rates:
        bench_rates()


if __name__ == "__main__":
    main()
