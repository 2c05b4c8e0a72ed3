"""Data-parallel mesh tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ghm_tpu.parallel import batch_sharding, make_mesh, shard_batch


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(jax.devices()[:8])


class TestMesh:
    def test_shard_batch_places_leading_axis(self, mesh):
        x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)

        @jax.jit
        def f(x):
            y = shard_batch({"x": x}, mesh)["x"]
            return (y * 2).sum()

        out = f(x)
        np.testing.assert_allclose(float(out), float((x * 2).sum()))

    def test_sharded_train_step_matches_single_device(self, mesh):
        """One mesh-sharded guided-CLIP train step produces the same loss
        trajectory as the unsharded step (same keys, replicated params)."""
        from dataclasses import dataclass
        from typing import Optional

        from ghm_tpu.optim import adamw_init
        from ghm_tpu.train.tasks import build_clip_task
        from ghm_tpu.train.trainer import Trainer
        from ghm_tpu.utils.config import (ClipModelConfig, DoubleTreeConfig,
                                          UtilConfig)

        @dataclass
        class Cfg(UtilConfig, DoubleTreeConfig, ClipModelConfig):
            job_name: Optional[str] = "meshtest"

        cfg = Cfg(n_ttree_layer=2, n_itree_layer=2, n_ttree_child=3,
                  n_itree_child=3, p_ttree_flip=0.2, p_itree_flip=0.2, K=4,
                  batch_size=8, clip_tmodel_nlayer=2, clip_imodel_nlayer=2,
                  clip_tmodel_deb=64, clip_imodel_deb=64,
                  clip_layernorm=True, clip_guide=True, total_iters=4)
        task, _, _ = build_clip_task(cfg, n_bayes=64)

        def run(mesh_arg):
            trainer = Trainer(task, total_iters=4, lr_max=1e-3, lr_min=1e-6,
                              log_interval=2, eval_interval=0, seed=224,
                              mesh=mesh_arg, bayes=task.bayes)
            params = task.init_fn(jax.random.PRNGKey(224))
            opt_state = adamw_init(params)
            chunk = trainer._build_chunk(4)
            _, _, aux = chunk(params, opt_state, 0, jax.random.PRNGKey(1))
            return np.asarray(aux["ploss"])

        sharded = run(mesh)
        single = run(None)
        np.testing.assert_allclose(sharded, single, rtol=2e-4)

    def test_sharded_sweep_matches_vmapped(self):
        """The production sweep program sharded over a 'sweep' mesh axis
        (1 model/device) produces the same per-model loss trajectories as
        the single-device vmapped sweep (VERDICT r2 Missing #3)."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from ghm_tpu.parallel import make_mesh
        from ghm_tpu.parallel.sweep import nwp_sweep_spec, run_sweep
        from ghm_tpu.train.sweep import SweepConfig

        cfg = SweepConfig(
            task="nwp", job_name="meshsweep", n_ttree_layer=2,
            n_itree_layer=2, n_ttree_child=2, n_itree_child=2, flip_scale=1,
            variable_type=10, batch_size=4, d_eb=32, n_head=2,
            n_model_layer=2, guide=False, layernorm=True,
            normalize_attn=True, penalty=0.1)
        p_list = [round(0.05 * i, 2) for i in range(1, 9)]

        def run(m):
            spec = nwp_sweep_spec(cfg, p_list, "JT_meshtest", n_bayes=32)
            _, results = run_sweep(
                spec, total_iters=4, lr_max=1e-3, lr_min=1e-6,
                log_interval=2, eval_interval=0, seed=224, save=False,
                mesh=m)
            return np.stack([r["loss_history"] for r in results])

        sweep_mesh = make_mesh(jax.devices()[:8], axis_name="sweep")
        np.testing.assert_allclose(run(sweep_mesh), run(None), rtol=2e-4)
