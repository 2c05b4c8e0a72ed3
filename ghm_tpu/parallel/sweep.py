"""Hyperparameter-sweep parallelism: N models trained as ONE compiled program.

The reference parallelizes its p_flip sweeps by launching 20 background
shell processes on one GPU (``scripts/experiments/exp_clip_standardTF.sh:6-43``).
The TPU-native replacement: stack the 20 tree-transition tensors on a
leading axis, ``vmap`` the entire training step (on-device sampling, BP
targets, forward/backward, per-model gradient clipping, AdamW) over that
axis, and run the whole sweep as a single XLA program.  Each model sees
exactly its own gradients (the sweep objective is the *sum* of per-model
losses; AdamW moments are elementwise so the stacked update equals N
independent updates), and per-model gradient clipping is vmapped.

Checkpoints are written per model into the reference folder layout, so the
evaluation layer consumes sweep-trained runs identically to single runs.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ghm_tpu.data.samplers import clip_batch, cdns_batch, nwp_batch
from ghm_tpu.optim import adamw_init, adamw_update, lr_cosine_schedule
from ghm_tpu.utils import checkpoint as ckpt

__all__ = ["SweepSpec", "run_sweep", "clip_sweep_spec", "cdns_sweep_spec",
           "nwp_sweep_spec", "sdns_sweep_spec", "snwp_sweep_spec"]


def _stack_transitions(samplers, attr):
    trans = [getattr(s, attr) for s in samplers]
    n_layer = len(trans[0])
    return tuple(jnp.stack([t[l] for t in trans]) for l in range(n_layer))


def clip_per_model(grads, max_norm):
    """Per-model global-norm clipping over stacked [N, ...] grad leaves."""
    leaves = jax.tree_util.tree_leaves(grads)
    sq = sum(jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1) for g in leaves)
    norm = jnp.sqrt(sq)  # [N]
    coef = jnp.minimum(max_norm / (norm + 1e-6), 1.0)

    def scale(g):
        return g * coef.reshape((-1,) + (1,) * (g.ndim - 1))

    return jax.tree_util.tree_map(scale, grads)


@dataclass
class SweepSpec:
    """Everything needed to run one vmapped sweep."""

    name: str
    n_models: int
    sample_fn: Callable      # key -> stacked batch pytree (leading axis N)
    loss_fn: Callable        # (stacked_params, stacked_batch) -> (loss_i, aux_i) per model (unvmapped single-model fn)
    init_fn: Callable        # key -> single-model params
    payload_fn: Callable     # single-model params -> checkpoint weight entries
    run_dirs: Sequence[str]  # per-model checkpoint run directories
    bayes: Sequence[tuple]


def _make_spec(cfg, p_list, builder, batch_fn, batch_kwargs, sampler_attr_pair,
               run_dir_fn, n_bayes):
    from ghm_tpu.utils.checkpoint import tree_folder_name

    tasks, samplers = [], []
    for i, p in enumerate(p_list):
        c = type(cfg)(**{**cfg.__dict__, "p_ttree_flip": p, "p_itree_flip": p})
        task, sampler, _ = builder(
            c, bayes_key=jax.random.fold_in(jax.random.PRNGKey(7), i),
            n_bayes=n_bayes)
        tasks.append(task)
        samplers.append(sampler)
    t_stack = _stack_transitions(samplers, sampler_attr_pair[0])
    i_stack = _stack_transitions(samplers, sampler_attr_pair[1])
    N = len(p_list)

    def sample_fn(key):
        keys = jax.random.split(key, N)
        fn = partial(batch_fn, **batch_kwargs)
        return jax.vmap(fn)(keys, t_stack, i_stack)

    # All tasks share model architecture and loss structure; use task 0's
    # single-model functions and vmap them at the call site.
    template = tasks[0]

    def loss_fn(params_i, raw_batch_i):
        return template.loss_fn(params_i, raw_batch_i)

    run_dirs = [run_dir_fn(p) for p in p_list]
    return SweepSpec(name=template.name, n_models=N, sample_fn=sample_fn,
                     loss_fn=loss_fn, init_fn=template.init_fn,
                     payload_fn=template.payload_fn, run_dirs=run_dirs,
                     bayes=[t.bayes for t in tasks]), tasks


def clip_sweep_spec(cfg, p_list, model_name, n_bayes=10000, logs_root="./logs"):
    from ghm_tpu.train.tasks import build_clip_task

    kwargs = dict(variable_type=cfg.variable_type, K=cfg.K,
                  batch_size=cfg.batch_size, guide=bool(cfg.clip_guide),
                  n_childs=(cfg.n_ttree_child, cfg.n_itree_child))
    ts = time.strftime("%Y%m%d-%H%M%S", time.localtime())

    def run_dir(p):
        tf = ckpt.tree_folder_name(cfg.K, cfg.n_ttree_layer, cfg.n_ttree_child,
                                   p, cfg.n_itree_layer, cfg.n_itree_child, p,
                                   cfg.flip_scale)
        return os.path.join(logs_root, cfg.job_name, tf, model_name, ts)

    spec, tasks = _make_spec(cfg, p_list, build_clip_task, clip_batch, kwargs,
                             ("t_transition", "i_transition"), run_dir, n_bayes)

    raw_sample = spec.sample_fn

    def adapt(raw):
        res_t, res_i = raw
        return {"t_leaves": res_t[0], "t_guides": res_t[2],
                "i_leaves": res_i[0], "i_guides": res_i[2]}

    spec.sample_fn = lambda key: adapt(raw_sample(key))
    return spec


def cdns_sweep_spec(cfg, p_list, model_name, n_bayes=10000, logs_root="./logs"):
    from ghm_tpu.train.tasks import build_cdns_task

    # diagnostics=False: unguided grid training skips the per-iteration BP
    # that only feeds the compare diagnostic (samplers.cdns_batch docstring).
    kwargs = dict(variable_type=cfg.variable_type, sigma=cfg.sigma,
                  batch_size=cfg.batch_size, guide=bool(cfg.guide),
                  n_childs=(cfg.n_ttree_child, cfg.n_itree_child),
                  diagnostics=False)
    ts = time.strftime("%Y%m%d-%H%M%S", time.localtime())

    def run_dir(p):
        tf = ckpt.tree_folder_name(cfg.K, cfg.n_ttree_layer, cfg.n_ttree_child,
                                   p, cfg.n_itree_layer, cfg.n_itree_child, p,
                                   cfg.flip_scale)
        return os.path.join(logs_root, cfg.job_name, tf, model_name, ts)

    spec, tasks = _make_spec(cfg, p_list, build_cdns_task, cdns_batch, kwargs,
                             ("t_transition", "i_transition"), run_dir, n_bayes)

    raw_sample = spec.sample_fn

    def adapt(raw):
        res_t, res_i = raw
        return {"t_leaves": res_t[0], "t_guides": res_t[2],
                "z": res_i[0], "clean": res_i[1].astype(jnp.float32),
                "i_guides": res_i[2], "posterior": res_i[3]}

    spec.sample_fn = lambda key: adapt(raw_sample(key))
    return spec


def nwp_sweep_spec(cfg, p_list, model_name, n_bayes=10000, logs_root="./logs"):
    from ghm_tpu.train.tasks import build_nwp_task

    kwargs = dict(variable_type=cfg.variable_type,
                  batch_size=cfg.batch_size, guide=bool(cfg.guide),
                  n_childs=(cfg.n_ttree_child, cfg.n_itree_child),
                  diagnostics=False)
    ts = time.strftime("%Y%m%d-%H%M%S", time.localtime())

    def run_dir(p):
        tf = ckpt.tree_folder_name(cfg.K, cfg.n_ttree_layer, cfg.n_ttree_child,
                                   p, cfg.n_itree_layer, cfg.n_itree_child, p,
                                   cfg.flip_scale)
        return os.path.join(logs_root, cfg.job_name, tf, model_name, ts)

    spec, tasks = _make_spec(cfg, p_list, build_nwp_task, nwp_batch, kwargs,
                             ("t_transition", "i_transition"), run_dir, n_bayes)

    raw_sample = spec.sample_fn

    def adapt(raw):
        res_t, res_i = raw
        return {"inputs": res_t[0], "targets": res_t[1], "t_guides": res_t[2],
                "pp": res_t[3], "i_leaves": res_i[0], "i_guides": res_i[2]}

    spec.sample_fn = lambda key: adapt(raw_sample(key))
    return spec


def _write_resume_blob(path, blob):
    """Atomic pickle write (tmp + rename) so a kill never corrupts it.

    The tmp name embeds the pid: if two processes ever train the same
    shard (an operator mistake, but it happened), a shared ``.tmp`` name
    makes one writer's ``os.replace`` race the other's and crash the
    whole sweep queue with FileNotFoundError. Unique tmp names make the
    duplicate merely wasteful, and the rename is tolerated if a
    concurrent writer won anyway.
    """
    import pickle

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f, protocol=4)
    try:
        os.replace(tmp, path)
    except FileNotFoundError:
        pass


def load_resume_blob(path):
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


def run_sweep(spec: SweepSpec, *, total_iters, lr_max, lr_min, warmup_iters=0,
              max_norm=1.0, weight_decay=0.001, log_interval=20,
              eval_interval=200, seed=224, logger=None, save=True,
              resume_path=None, stop_after=None, mesh=None,
              mesh_axis="sweep"):
    """Train all sweep models simultaneously; write per-model checkpoints.

    ``resume_path`` names a sweep-level state blob (stacked params + AdamW
    state + histories + original run dirs).  It is written at every
    eval-interval checkpoint and on a ``stop_after`` pause, so an interrupted
    grid relaunches from its last checkpoint instead of iteration zero — the
    per-model ``checkpoint.pth`` files keep the reference schema untouched.
    Intermediate eval-interval points write only the resume blob (one bulk
    device→host fetch); the per-model reference-schema checkpoints are
    written on pause and completion — over a remote-device tunnel the
    per-model slicing otherwise costs dozens of seconds per checkpoint.
    ``stop_after`` pauses the sweep after ~that many iterations this
    invocation (rounded up to a chunk), leaving a resumable blob.

    ``mesh`` (a 1-D ``jax.sharding.Mesh`` whose axis is ``mesh_axis``) shards
    the stacked model axis across devices: each chip trains ``N/n_devices``
    of the sweep's models and the only cross-chip collective is the tiny
    scalar loss-sum psum.  This is the multi-chip production path replacing
    the reference's "20 background processes on one GPU"
    (scripts/experiments/exp_clip_standardTF.sh:6-43): on a v5e-8 a 16-model
    shard runs as one program with 2 models per chip.  Model count must be
    divisible by the mesh size.  Checkpoints/resume blobs are device_get
    (all-gathered) exactly as in the single-device path, so resume blobs are
    interchangeable between mesh sizes — including with the blob splitter
    (tools/split_resume_blob.py).
    """
    import logging

    logger = logger or logging.getLogger("ghm_tpu")
    N = spec.n_models

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = int(np.prod(list(mesh.shape.values())))
        if N % n_dev:
            raise ValueError(f"sweep n_models={N} not divisible by mesh "
                             f"size {n_dev}")
        row = NamedSharding(mesh, PartitionSpec(mesh_axis))
        rep = NamedSharding(mesh, PartitionSpec())

        def shard_state(tree):
            shardings = jax.tree_util.tree_map(
                lambda x: row if (getattr(x, "ndim", 0) > 0
                                  and x.shape[0] == N) else rep, tree)
            return jax.device_put(tree, shardings)
    total = int(total_iters)
    start_it = 0
    resume_blob = None
    if resume_path and os.path.exists(resume_path):
        resume_blob = load_resume_blob(resume_path)
        if resume_blob.get("done"):
            logger.info(f"sweep[{spec.name}] already complete per "
                        f"{resume_path}; skipping (delete the blob to "
                        f"retrain)")
            spec.run_dirs = list(resume_blob["run_dirs"])
            return None, None
        if resume_blob.get("n_models") != N or resume_blob.get("total") != total:
            raise ValueError(
                f"resume blob {resume_path} was written for "
                f"n_models={resume_blob.get('n_models')}, "
                f"total={resume_blob.get('total')}; current sweep has "
                f"n_models={N}, total={total}")
    if resume_blob is not None and "params" in resume_blob:
        params = jax.tree_util.tree_map(jnp.asarray, resume_blob["params"])
        opt_state = jax.tree_util.tree_map(jnp.asarray,
                                           resume_blob["opt_state"])
        start_it = int(resume_blob["iter"])
        spec.run_dirs = list(resume_blob["run_dirs"])
        logger.info(f"sweep[{spec.name}] resuming at iter {start_it}/{total} "
                    f"from {resume_path}")
    else:
        init_keys = jax.random.split(jax.random.PRNGKey(seed), N)
        params = jax.vmap(spec.init_fn)(init_keys)
        opt_state = adamw_init(params)
    if mesh is not None:
        params = shard_state(params)
        opt_state = shard_state(opt_state)
    base_key = jax.random.PRNGKey(0xA11CE)

    def one_step(params, opt_state, it):
        key = jax.random.fold_in(base_key, it)
        batch = spec.sample_fn(key)
        if mesh is not None:
            # Pin the sampled batch (and any stacked frozen-encoder params
            # riding in it) to the sweep axis so sampling itself partitions.
            batch = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, row)
                if (getattr(x, "ndim", 0) > 0 and x.shape[0] == N) else x,
                batch)
        vloss = jax.vmap(spec.loss_fn)

        def total(p):
            losses, aux = vloss(p, batch)
            # Sum keeps each model's gradient exactly its own gradient.
            return jnp.sum(losses), {**aux, "ploss": losses}

        (loss, aux), grads = jax.value_and_grad(total, has_aux=True)(params)
        grads = clip_per_model(grads, max_norm)
        lr = lr_cosine_schedule(it, lr_max, lr_min, warmup_iters, total_iters)
        params, opt_state = adamw_update(params, grads, opt_state, lr,
                                         weight_decay=weight_decay)
        return params, opt_state, aux

    chunk = max(1, int(log_interval))

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(params, opt_state, start):
        def body(carry, i):
            params, opt_state = carry
            params, opt_state, aux = one_step(params, opt_state, start + i)
            return (params, opt_state), aux

        (params, opt_state), auxs = jax.lax.scan(body, (params, opt_state),
                                                 jnp.arange(chunk))
        return params, opt_state, auxs

    ploss_hist = np.zeros((N, total))
    loss_hist = np.zeros((N, total))
    compare_hist = np.zeros((N, total))
    has_compare = False
    if resume_blob is not None and "params" in resume_blob:
        loss_hist[:, :start_it] = resume_blob["loss_hist"][:, :start_it]
        ploss_hist[:, :start_it] = resume_blob["ploss_hist"][:, :start_it]
        if resume_blob.get("has_compare"):
            compare_hist[:, :start_it] = resume_blob["compare_hist"][:, :start_it]
            has_compare = True

    def save_all(params, upto):
        # One bulk transfer, then slice on host: per-model device slicing
        # issues hundreds of tiny tunnel fetches.
        params = jax.device_get(params)
        results = []
        for i, run_dir in enumerate(spec.run_dirs):
            params_i = jax.tree_util.tree_map(lambda x: x[i], params)
            payload = dict(spec.payload_fn(params_i))
            payload.update({
                "iter": upto,
                "loss_history": loss_hist[i],
                "ploss_history": ploss_hist[i],
                "bayes": spec.bayes[i][0],
            })
            if has_compare:
                payload["compare"] = compare_hist[i]
            if save:
                ckpt.save_checkpoint(os.path.join(run_dir, "checkpoint.pth"),
                                     payload)
            results.append(payload)
        return results

    def save_resume(params, opt_state, upto):
        if not resume_path:
            return
        params, opt_state = jax.device_get((params, opt_state))
        blob = {
            "n_models": N, "total": total, "iter": upto,
            "run_dirs": list(spec.run_dirs),
            "params": jax.tree_util.tree_map(np.asarray, params),
            "opt_state": jax.tree_util.tree_map(np.asarray, opt_state),
            "loss_hist": loss_hist, "ploss_hist": ploss_hist,
            "has_compare": has_compare,
        }
        if has_compare:
            blob["compare_hist"] = compare_hist
        _write_resume_blob(resume_path, blob)

    t0 = time.time()
    it = start_it
    last_ckpt = start_it
    while it < total:
        n = min(chunk, total - it)
        if n != chunk:
            # tail chunk: re-jit at the smaller static size
            tail = jax.jit(lambda p, o, s: _run_n(one_step, p, o, s, n))
            params, opt_state, auxs = tail(params, opt_state, it)
        else:
            params, opt_state, auxs = run_chunk(params, opt_state, it)
        auxs = jax.device_get(auxs)
        # auxs leaves are [chunk, N]
        loss_hist[:, it : it + n] = np.asarray(auxs["loss"]).T
        ploss_hist[:, it : it + n] = np.asarray(auxs["ploss"]).T
        if "compare" in auxs:
            compare_hist[:, it : it + n] = np.asarray(auxs["compare"]).T
            has_compare = True
        it += n
        if it % (chunk * 5) == 0 or it >= total:
            logger.info(
                f"sweep[{spec.name}] iter {it}/{total} "
                f"mean loss {loss_hist[:, max(0, it - n):it].mean():.4f} "
                f"({time.time() - t0:.1f}s)")
        if save and eval_interval and it < total and \
                it // eval_interval > last_ckpt // eval_interval:
            save_resume(params, opt_state, it)
            last_ckpt = it
        if stop_after is not None and it - start_it >= stop_after and it < total:
            if save:
                save_all(params, it)
            save_resume(params, opt_state, it)
            logger.info(f"sweep[{spec.name}] paused at iter {it}/{total} "
                        f"(stop_after={stop_after}); resumable via "
                        f"{resume_path}")
            return params, None
    results = save_all(params, total)
    if resume_path:
        # Completion marker: tiny blob (no params) so relaunches skip.
        _write_resume_blob(resume_path, {
            "n_models": N, "total": total, "iter": total, "done": True,
            "run_dirs": list(spec.run_dirs)})
    return params, results


def _run_n(one_step, params, opt_state, start, n):
    def body(carry, i):
        params, opt_state = carry
        params, opt_state, aux = one_step(params, opt_state, start + i)
        return (params, opt_state), aux

    (params, opt_state), auxs = jax.lax.scan(body, (params, opt_state),
                                             jnp.arange(n))
    return params, opt_state, auxs


# ----------------------------------------------------------------------
# Sequential-task sweeps: the frozen per-p CLIP encoders are stacked on the
# sweep axis and ride through the batch pytree, so the vmapped loss sees its
# own model's frozen features (reference trains these as 20 more background
# processes; scripts/experiments/exp_{cdm,vlm}_{standardTF,shallowTF}.sh).
# ----------------------------------------------------------------------

def _stacked_clip(cfg, p_list, clip_feature, side, n_token, logs_root):
    from ghm_tpu.train.tasks import load_frozen_clip_encoder

    model = None
    stacked = None
    all_params = []
    for p in p_list:
        tf = ckpt.tree_folder_name(cfg.K, cfg.n_ttree_layer, cfg.n_ttree_child,
                                   p, cfg.n_itree_layer, cfg.n_itree_child, p,
                                   cfg.flip_scale)
        model, params = load_frozen_clip_encoder(tf, clip_feature, side,
                                                 n_token, cfg.variable_type,
                                                 logs_root)
        all_params.append(params)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *all_params)
    return model, stacked


def sdns_sweep_spec(cfg, p_list, model_name, clip_feature="TF",
                    n_bayes=10000, logs_root="./logs"):
    """Sequential-CDM sweep: one vmapped program across the p grid."""
    from ghm_tpu.models import ConditionalDenoiseEncoderTransformer
    from ghm_tpu.models.losses import conditional_guided_ls_loss, ls_loss
    from ghm_tpu.data import ConditionalDenoiseSampler

    guide = bool(cfg.guide)
    B = cfg.batch_size
    n_childs = (cfg.n_ttree_child, cfg.n_itree_child)
    samplers = [ConditionalDenoiseSampler(
        [cfg.n_ttree_layer, cfg.n_itree_layer], list(n_childs),
        p_flips=[p, p], sigma=cfg.sigma, flip_scale=cfg.flip_scale,
        variable_type=cfg.variable_type, seedtree=42) for p in p_list]
    d_i = samplers[0].n_i_leaves
    clip_model, clip_stack = _stacked_clip(cfg, p_list, clip_feature, "text",
                                           samplers[0].n_t_leaves, logs_root)
    model = ConditionalDenoiseEncoderTransformer(
        n_token=d_i + 1, n_i_token=d_i, num_class=cfg.variable_type,
        n_embd=cfg.d_eb, n_layer=cfg.n_model_layer,
        n_guided_layers=[1, cfg.n_itree_layer], n_head=cfg.n_head,
        n_mlp_hidden=4 * cfg.d_eb, activation="softmax",
        normalize_attn=cfg.normalize_attn, layernorm=cfg.layernorm,
        maxnorm=False, sequential=True, guide=guide,
        remat=bool(getattr(cfg, 'remat', False)))
    t_stack = _stack_transitions(samplers, "t_transition")
    i_stack = _stack_transitions(samplers, "i_transition")
    N = len(p_list)

    def sample_fn(key):
        keys = jax.random.split(key, N)
        fn = partial(cdns_batch, variable_type=cfg.variable_type,
                     sigma=cfg.sigma, batch_size=B, guide=guide,
                     n_childs=n_childs, diagnostics=False)
        res_t, res_i = jax.vmap(fn)(keys, t_stack, i_stack)
        return {"t_leaves": res_t[0], "z": res_i[0],
                "clean": res_i[1].astype(jnp.float32),
                "i_guides": res_i[2], "posterior": res_i[3],
                "clip_params": clip_stack}

    def loss_fn(params_i, batch_i):
        feat = clip_model.apply(batch_i["clip_params"], batch_i["t_leaves"])[0]
        feat = jax.lax.stop_gradient(feat)[:, None, :]
        pred, guides = model.apply(params_i, feat, batch_i["z"])
        targets = (batch_i["clean"], ((feat, feat), batch_i["i_guides"]))
        loss, p0, p1, p2, p3 = conditional_guided_ls_loss(
            (pred, guides), targets, penalty=cfg.penalty, guide=guide)
        aux = {"loss": ls_loss(pred, batch_i["clean"])}
        if batch_i["posterior"] is not None:
            aux["compare"] = ls_loss(pred, batch_i["posterior"])
        return loss, aux

    ts = time.strftime("%Y%m%d-%H%M%S", time.localtime())

    def run_dir(p):
        tf = ckpt.tree_folder_name(cfg.K, cfg.n_ttree_layer, cfg.n_ttree_child,
                                   p, cfg.n_itree_layer, cfg.n_itree_child, p,
                                   cfg.flip_scale)
        return os.path.join(logs_root, cfg.job_name, tf, model_name, ts)

    bayes = [s.get_bayes(jax.random.fold_in(jax.random.PRNGKey(7), i), n_bayes)
             for i, s in enumerate(samplers)]
    return SweepSpec(
        name="Sequential_CDNS", n_models=N, sample_fn=sample_fn,
        loss_fn=loss_fn, init_fn=model.init,
        payload_fn=lambda p: {"model_state_dict": ckpt.pack_params(p)},
        run_dirs=[run_dir(p) for p in p_list], bayes=bayes)


def snwp_sweep_spec(cfg, p_list, model_name, clip_feature="TF",
                    n_bayes=10000, logs_root="./logs"):
    """Sequential-VLM sweep: one vmapped program across the p grid."""
    from ghm_tpu.models import AutoRegressiveTransformer
    from ghm_tpu.models.losses import (conditional_guided_ce_loss,
                                       cross_entropy, kl_divergence)
    from ghm_tpu.data import NextWordPredictSampler

    guide = bool(cfg.guide)
    B = cfg.batch_size
    n_childs = (cfg.n_ttree_child, cfg.n_itree_child)
    samplers = [NextWordPredictSampler(
        [cfg.n_ttree_layer, cfg.n_itree_layer], list(n_childs),
        p_flips=[p, p], flip_scale=cfg.flip_scale,
        variable_type=cfg.variable_type, seedtree=42) for p in p_list]
    clip_model, clip_stack = _stacked_clip(cfg, p_list, clip_feature, "image",
                                           samplers[0].n_i_leaves, logs_root)
    model = AutoRegressiveTransformer(
        n_token=samplers[0].n_t_leaves, n_i_token=1,
        num_class=cfg.variable_type, n_embd=cfg.d_eb,
        n_layer=cfg.n_model_layer, n_guided_layers=[cfg.n_ttree_layer, 1],
        n_head=cfg.n_head, n_mlp_hidden=4 * cfg.d_eb, auto_regressive=True,
        activation="softmax", normalize_attn=cfg.normalize_attn,
        layernorm=cfg.layernorm, sequential=True, guide=guide,
        remat=bool(getattr(cfg, 'remat', False)))
    t_stack = _stack_transitions(samplers, "t_transition")
    i_stack = _stack_transitions(samplers, "i_transition")
    N = len(p_list)

    def sample_fn(key):
        keys = jax.random.split(key, N)
        fn = partial(nwp_batch, variable_type=cfg.variable_type,
                     batch_size=B, guide=guide, n_childs=n_childs,
                     diagnostics=False)
        res_t, res_i = jax.vmap(fn)(keys, t_stack, i_stack)
        return {"inputs": res_t[0], "targets": res_t[1],
                "t_guides": res_t[2], "pp": res_t[3],
                "i_leaves": res_i[0], "clip_params": clip_stack}

    def loss_fn(params_i, batch_i):
        feat = clip_model.apply(batch_i["clip_params"], batch_i["i_leaves"])[0]
        feat = jax.lax.stop_gradient(feat)[:, None, :]
        logits, guides = model.apply(params_i, batch_i["inputs"], feat)
        targets = (batch_i["targets"], (batch_i["t_guides"], (feat, feat)))
        loss, p0, p1, p2, p3 = conditional_guided_ce_loss(
            (logits, guides), targets, penalty=cfg.penalty, guide=guide)
        ce = cross_entropy(logits.reshape(-1, logits.shape[-1]),
                           batch_i["targets"].reshape(-1))
        plain = jnp.mean(jnp.mean(
            ce.reshape(-1, batch_i["targets"].shape[1]), axis=1))
        aux = {"loss": plain}
        if batch_i["pp"] is not None:
            aux["compare"] = kl_divergence(logits, batch_i["pp"])
        return loss, aux

    ts = time.strftime("%Y%m%d-%H%M%S", time.localtime())

    def run_dir(p):
        tf = ckpt.tree_folder_name(cfg.K, cfg.n_ttree_layer, cfg.n_ttree_child,
                                   p, cfg.n_itree_layer, cfg.n_itree_child, p,
                                   cfg.flip_scale)
        return os.path.join(logs_root, cfg.job_name, tf, model_name, ts)

    bayes = [s.get_bayes(jax.random.fold_in(jax.random.PRNGKey(7), i), n_bayes)
             for i, s in enumerate(samplers)]
    return SweepSpec(
        name="Sequential_NWP", n_models=N, sample_fn=sample_fn,
        loss_fn=loss_fn, init_fn=model.init,
        payload_fn=lambda p: {"model_state_dict": ckpt.pack_params(p)},
        run_dirs=[run_dir(p) for p in p_list], bayes=bayes)
