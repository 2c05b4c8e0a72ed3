"""Optimizer and loss parity vs reference golden values
(tools/gen_golden_optim.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from ghm_tpu.optim import (
    adamw_init,
    adamw_update,
    clip_by_global_norm,
    lr_cosine_schedule,
)
from ghm_tpu.models import losses as L


class TestAdamW:
    def test_trajectory_matches_reference(self, golden):
        data = golden("optim_adamw.npz")
        params = {"w": jnp.asarray(data["p_init"])}
        state = adamw_init(params)
        for i in range(5):
            grads = {"w": jnp.asarray(data[f"g{i}"])}
            params, state = adamw_update(params, grads, state,
                                         float(data["lrs"][i]),
                                         weight_decay=0.001)
            np.testing.assert_allclose(np.asarray(params["w"]),
                                       data[f"step{i}"], atol=2e-6,
                                       err_msg=f"step {i}")

    def test_cosine_schedule(self, golden):
        data = golden("optim_adamw.npz")
        ours = [float(lr_cosine_schedule(t, 1e-3, 1e-6, 10, 100))
                for t in data["sched_ts"]]
        np.testing.assert_allclose(ours, data["sched"], rtol=1e-5)

    def test_clip_by_global_norm(self, golden):
        data = golden("optim_clip.npz")
        grads = {"a": jnp.asarray(data["g0"]), "b": jnp.asarray(data["g1"])}
        clipped, norm = clip_by_global_norm(grads, 1.0)
        np.testing.assert_allclose(float(norm), data["norm"], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(clipped["a"]), data["c0"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(clipped["b"]), data["c1"], atol=1e-6)


class TestLosses:
    def test_clip_losses(self, golden):
        data = golden("losses.npz")
        B, K = 6, 4
        t_out, i_out = jnp.asarray(data["t_out"]), jnp.asarray(data["i_out"])
        np.testing.assert_allclose(float(L.clip_loss(t_out, i_out, K, B)),
                                   data["clip_plain"], rtol=1e-5)
        tg = (jnp.asarray(data["tg0"]), jnp.asarray(data["tg1"]))
        tgt = (jnp.asarray(data["tgt0"]), jnp.asarray(data["tgt1"]))
        loss, diag = L.guided_clip_loss((t_out, tg), (i_out, tg), (tgt, tgt),
                                        K, B, penalty=1e-3, guide=True)
        np.testing.assert_allclose(float(loss), data["gclip"], rtol=1e-4)
        np.testing.assert_allclose(float(diag), data["gdiag"], rtol=1e-4)

    def test_conditional_guided_ce(self, golden):
        data = golden("losses.npz")
        logits, labels = jnp.asarray(data["logits"]), jnp.asarray(data["labels"])
        tgi = tuple(jnp.asarray(data[f"tgi{i}"]) for i in range(5))
        tgt = tuple(jnp.asarray(data[f"tgt_{i}"]) for i in range(5))
        igi = tuple(jnp.asarray(data[f"igi{i}"]) for i in range(2))
        igt = tuple(jnp.asarray(data[f"igt{i}"]) for i in range(2))
        out = L.conditional_guided_ce_loss((logits, (tgi, igi)),
                                           (labels, (tgt, igt)),
                                           penalty=1e-3, guide=True)
        np.testing.assert_allclose(float(out[0]), data["ce_total"], rtol=1e-4)
        np.testing.assert_allclose([float(x) for x in out[1:]],
                                   data["ce_parts"], rtol=1e-3)

    def test_conditional_guided_ls(self, golden):
        data = golden("losses.npz")
        pred, target = jnp.asarray(data["pred"]), jnp.asarray(data["target"])
        igi = tuple(jnp.asarray(data[f"lgi{i}"]) for i in range(5))
        igt = tuple(jnp.asarray(data[f"lgt{i}"]) for i in range(5))
        tgi = tuple(jnp.asarray(data[f"ltgi{i}"]) for i in range(2))
        tgt = tuple(jnp.asarray(data[f"ltgt{i}"]) for i in range(2))
        out = L.conditional_guided_ls_loss((pred, (tgi, igi)),
                                           (target, (tgt, igt)),
                                           penalty=0.1, guide=True)
        np.testing.assert_allclose(float(out[0]), data["ls_total"], rtol=1e-4)
        np.testing.assert_allclose([float(x) for x in out[1:]],
                                   data["ls_parts"], rtol=1e-3)

    def test_kl_and_ls_and_gce(self, golden):
        data = golden("losses.npz")
        kld = L.kl_divergence(jnp.asarray(data["logits"]), jnp.asarray(data["probs"]))
        np.testing.assert_allclose(float(kld), data["kld"], rtol=1e-4)
        lsl = L.ls_loss(jnp.asarray(data["pred"]), jnp.asarray(data["target"]))
        np.testing.assert_allclose(float(lsl), data["lsl"], rtol=1e-5)
        igi = tuple(jnp.asarray(data[f"igi{i}"]) for i in range(2))
        igt = tuple(jnp.asarray(data[f"igt{i}"]) for i in range(2))
        gce = L.guided_ce_loss((jnp.asarray(data["gce_logits"]), igi),
                               (jnp.asarray(data["gce_labels"]), igt),
                               penaltys=(1.0, 0.05), guide=True)
        np.testing.assert_allclose(float(gce), data["gce"], rtol=1e-4)
