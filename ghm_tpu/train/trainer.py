"""Unified training engine.

The reference repeats a hand-written host loop in six scripts
(``training/train_*.py``: sample on CPU → H2D copy → forward/backward →
clip → schedule → step → log/checkpoint).  Here one engine serves every
task, and the *entire* iteration — on-device GHM sampling, BP targets,
forward, backward, gradient clipping, LR schedule, and the AdamW update — is
a single compiled XLA program.  Iterations are fused ``log_interval`` at a
time with ``lax.scan``, so the host only sees one tiny scalar transfer per
logging window instead of per step.

Data parallelism: pass a ``jax.sharding.Mesh`` and the engine runs the same
program SPMD over it — batches sharded on the leading axis, parameters
replicated, gradient ``psum`` inserted by XLA (SURVEY.md §5.8).

Checkpoints use the reference schema/layout (utils/checkpoint.py) and resume
restores the true iteration counter (fixing the reference's discarded-iter
bug, SURVEY.md Appendix A #6).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ghm_tpu.optim import (
    adamw_init,
    adamw_update,
    clip_by_global_norm,
    lr_cosine_schedule,
)
from ghm_tpu.parallel.mesh import shard_batch
from ghm_tpu.utils import checkpoint as ckpt

__all__ = ["Task", "TrainResult", "Trainer"]


@dataclass
class Task:
    """Everything the engine needs to train one task.

    sample_fn(key) -> batch pytree (pure, jittable; runs on device).
    loss_fn(params, batch) -> (scalar loss, aux dict of scalar diagnostics).
      aux must always contain 'loss' (the penalty-free objective logged as
      ``loss_history``); optional keys: 'compare' and 'pen0'..'pen3'.
    init_fn(key) -> params pytree.
    payload_fn(flat_params_dict) -> checkpoint entries for the model weights
      (e.g. {'model_state_dict': ...} or the CLIP two-model layout).
    """

    name: str
    sample_fn: Callable
    loss_fn: Callable
    init_fn: Callable
    payload_fn: Callable
    load_fn: Callable = None  # payload dict -> params (for resume)
    bayes: tuple = (0.0, 0.0)


@dataclass
class TrainResult:
    params: object
    opt_state: object
    loss_history: np.ndarray
    ploss_history: np.ndarray
    compare_history: Optional[np.ndarray]


class Trainer:
    """Scan-fused, mesh-aware training loop."""

    def __init__(self, task: Task, *, total_iters, lr_max, lr_min,
                 warmup_iters=0, max_norm=1.0, weight_decay=0.001,
                 log_interval=20, eval_interval=200, seed=224,
                 mesh=None, logger=None, checkpoint_path=None,
                 track_compare=False, bayes=(0.0, 0.0), wandb_run=None):
        self.task = task
        self.total_iters = int(total_iters)
        self.lr_max, self.lr_min = float(lr_max), float(lr_min)
        self.warmup_iters = int(warmup_iters)
        self.max_norm = float(max_norm)
        self.weight_decay = float(weight_decay)
        self.log_interval = max(1, int(log_interval))
        self.eval_interval = int(eval_interval)
        self.seed = int(seed)
        self.mesh = mesh
        self.logger = logger or logging.getLogger()
        self.checkpoint_path = checkpoint_path
        self.track_compare = track_compare
        self.bayes = bayes
        self.wandb_run = wandb_run
        self._chunk_fn = None

    # ------------------------------------------------------------------
    def _one_step(self, params, opt_state, it, base_key):
        key = jax.random.fold_in(base_key, it)
        batch = self.task.sample_fn(key)
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)

        (loss, aux), grads = jax.value_and_grad(self.task.loss_fn, has_aux=True)(
            params, batch)
        grads, _ = clip_by_global_norm(grads, self.max_norm)
        lr = lr_cosine_schedule(it, self.lr_max, self.lr_min,
                                self.warmup_iters, self.total_iters)
        params, opt_state = adamw_update(params, grads, opt_state, lr,
                                         weight_decay=self.weight_decay)
        aux = dict(aux)
        aux["ploss"] = loss
        aux["lr"] = lr
        return params, opt_state, aux

    def _build_chunk(self, chunk_size):
        def chunk(params, opt_state, start_iter, base_key):
            def body(carry, i):
                params, opt_state = carry
                params, opt_state, aux = self._one_step(
                    params, opt_state, start_iter + i, base_key)
                return (params, opt_state), aux

            (params, opt_state), auxs = jax.lax.scan(
                body, (params, opt_state), jnp.arange(chunk_size))
            return params, opt_state, auxs

        return jax.jit(chunk, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def init_state(self, init_from="scratch"):
        """Returns (params, opt_state, start_iter, prior_payload_or_None).

        On resume the full checkpoint payload is returned so ``fit`` can
        restore the pre-resume loss histories — the risk evals read
        ``loss_history[-100:]`` from checkpoints, so a resumed run must carry
        its whole training curve, not just the post-resume suffix.
        """
        if init_from != "scratch" and self.checkpoint_path:
            payload = ckpt.load_checkpoint(self.checkpoint_path)
            params = self.task.load_fn(payload)
            opt_state = ckpt.unpack_opt_state(payload["optimizer_state_dict"])
            start = int(payload["iter"])
            return params, opt_state, start, payload
        params = self.task.init_fn(jax.random.PRNGKey(self.seed))
        return params, adamw_init(params), 0, None

    @staticmethod
    def _restore_history(dst, payload, key, upto):
        if payload is None or key not in payload or dst is None:
            return
        src = np.asarray(payload[key])
        n = min(upto, src.size, dst.size)
        dst[:n] = src[:n]

    def fit(self, init_from="scratch", data_seed=0, stop_after=None):
        """Train to ``total_iters``; ``stop_after`` pauses (checkpointed,
        resumable via ``init_from != 'scratch'``) after ~that many iterations
        this invocation, rounded up to a log chunk."""
        params, opt_state, start, prior = self.init_state(init_from)
        total = self.total_iters
        ploss_hist = np.zeros(total)
        loss_hist = np.zeros(total)
        compare_hist = np.zeros(total) if self.track_compare else None
        self._restore_history(loss_hist, prior, "loss_history", start)
        self._restore_history(ploss_hist, prior, "ploss_history", start)
        self._restore_history(compare_hist, prior, "compare", start)
        base_key = jax.random.PRNGKey(jnp.uint32(0x5EED0000 + data_seed))
        chunk_size = self.log_interval
        run_chunk = self._build_chunk(chunk_size)
        t0 = time.time()
        it = start
        while it < total:
            n = min(chunk_size, total - it)
            if n != chunk_size:
                run_tail = self._build_chunk(n)
                params, opt_state, auxs = run_tail(params, opt_state, it, base_key)
            else:
                params, opt_state, auxs = run_chunk(params, opt_state, it, base_key)
            auxs = jax.device_get(auxs)
            end = it + n
            ploss_hist[it:end] = auxs["ploss"]
            loss_hist[it:end] = auxs["loss"]
            if compare_hist is not None and "compare" in auxs:
                compare_hist[it:end] = auxs["compare"]
            prev = it
            it = end
            self._log(it, ploss_hist, loss_hist, compare_hist, auxs, t0)
            crossed_eval = (self.eval_interval
                            and it // self.eval_interval > prev // self.eval_interval)
            if self.checkpoint_path and crossed_eval:
                self._save(params, opt_state, it, loss_hist, ploss_hist,
                           compare_hist)
            if stop_after is not None and it - start >= stop_after \
                    and it < total:
                if self.checkpoint_path:
                    self._save(params, opt_state, it, loss_hist, ploss_hist,
                               compare_hist)
                self.logger.info(f"paused at iter {it}/{total} (stop_after)")
                return TrainResult(params, opt_state, loss_hist, ploss_hist,
                                   compare_hist)
        if self.checkpoint_path:
            self._save(params, opt_state, it, loss_hist, ploss_hist,
                       compare_hist)
        return TrainResult(params, opt_state, loss_hist, ploss_hist,
                           compare_hist)

    # ------------------------------------------------------------------
    def _log(self, it, ploss, loss, compare, auxs, t0):
        window = slice(it // 2, it)
        msg = (f"Iter: {it}, "
               f"Penalty train loss: {np.mean(ploss[window]):.4f}, "
               f"Train loss: {np.mean(loss[window]):.4f}, ")
        if compare is not None:
            msg += f"Compare: {np.mean(compare[window]):.4f}, "
        pens = [k for k in ("pen0", "pen1", "pen2", "pen3") if k in auxs]
        if pens:
            vals = ", ".join(f"{float(np.asarray(auxs[k])[-1]):.4f}" for k in pens)
            msg += f"Penalty: [{vals}], "
        lr_now = float(np.asarray(auxs["lr"])[-1])
        msg += (f"Bayes: {self.bayes[0]:.4f}, "
                f"LR: {lr_now:.6f}, "
                f"Time: {time.time() - t0:.2f}s")
        self.logger.info(msg)
        if self.wandb_run is not None:
            # Per-interval metric series, mirroring reference
            # train_CLIP.py:181-187 (train/penalty losses, lr, Bayes).
            record = {
                "iter": it,
                "train_loss": float(np.mean(loss[window])),
                "penalty_train_loss": float(np.mean(ploss[window])),
                "lr": lr_now,
                "Bayes_loss": self.bayes[0],
            }
            if compare is not None:
                record["compare"] = float(np.mean(compare[window]))
            for k in pens:
                record[k] = float(np.asarray(auxs[k])[-1])
            self.wandb_run.log(record, step=it)

    def _save(self, params, opt_state, it, loss_hist, ploss_hist, compare_hist):
        payload = dict(self.task.payload_fn(params))
        payload.update({
            "optimizer_state_dict": ckpt.pack_opt_state(opt_state),
            "iter": it,
            "loss_history": loss_hist,
            "ploss_history": ploss_hist,
            "bayes": self.bayes[0],
        })
        if compare_hist is not None:
            payload["compare"] = compare_hist
        ckpt.save_checkpoint(self.checkpoint_path, payload)
