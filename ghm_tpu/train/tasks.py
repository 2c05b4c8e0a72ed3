"""Task builders: wire samplers, models, and losses into engine Tasks.

One builder per reference training entry point
(``training/train_{CLIP,CDNS,NWP,CLS,sequential_DNS,sequential_NWP}.py``),
returning a :class:`ghm_tpu.train.trainer.Task` whose ``sample_fn`` and
``loss_fn`` compose into a single jitted step.  Frozen-CLIP features for the
sequential stacks are computed inside the same compiled program with
``stop_gradient`` (the reference runs a full unguarded torch forward each
step, ``train_sequential_NWP.py:164``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ghm_tpu.data import (
    ClipSampler,
    ConditionalDenoiseSampler,
    NextWordPredictSampler,
)
from ghm_tpu.models import (
    AutoRegressiveTransformer,
    ConditionalDenoiseEncoderTransformer,
    EncoderTransformer,
)
from ghm_tpu.models.losses import (
    clip_loss,
    conditional_guided_ce_loss,
    conditional_guided_ls_loss,
    cross_entropy,
    guided_ce_loss,
    guided_clip_loss,
    kl_divergence,
    ls_loss,
)
from ghm_tpu.train.trainer import Task
from ghm_tpu.utils import checkpoint as ckpt

__all__ = [
    "build_clip_task",
    "build_cdns_task",
    "build_nwp_task",
    "build_cls_task",
    "build_sequential_dns_task",
    "build_sequential_nwp_task",
    "load_frozen_clip_encoder",
]


def _uniform_py(v):
    return np.ones(v) / v


# ----------------------------------------------------------------------
# CLIP (reference training/train_CLIP.py)
# ----------------------------------------------------------------------
def build_clip_task(cfg, bayes_key=None, n_bayes=10000):
    sampler = ClipSampler(
        [cfg.n_ttree_layer, cfg.n_itree_layer],
        [cfg.n_ttree_child, cfg.n_itree_child],
        p_flips=[cfg.p_ttree_flip, cfg.p_itree_flip],
        K=cfg.K, flip_scale=cfg.flip_scale, variable_type=cfg.variable_type,
        translation_invariance=True, seedtree=42)
    guide = bool(cfg.clip_guide)
    B, K = cfg.batch_size, cfg.K

    tmodel = EncoderTransformer(
        n_token=sampler.n_t_leaves, num_class=cfg.variable_type,
        n_embd=cfg.clip_tmodel_deb, n_layer=cfg.clip_tmodel_nlayer,
        n_guided_layer=cfg.n_ttree_layer, n_head=cfg.clip_tmodel_nhead,
        n_mlp_multiplier=4, activation=cfg.clip_activation, mlp=True,
        normalize_attn=cfg.clip_attennorm, layernorm=cfg.clip_layernorm,
        guide=guide, remat=bool(getattr(cfg, 'remat', False)))
    imodel = EncoderTransformer(
        n_token=sampler.n_i_leaves, num_class=cfg.variable_type,
        n_embd=cfg.clip_imodel_deb, n_layer=cfg.clip_imodel_nlayer,
        n_guided_layer=cfg.n_itree_layer, n_head=cfg.clip_imodel_nhead,
        n_mlp_multiplier=4, activation=cfg.clip_activation, mlp=True,
        normalize_attn=cfg.clip_attennorm, layernorm=cfg.clip_layernorm,
        guide=guide, remat=bool(getattr(cfg, 'remat', False)))

    def sample_fn(key):
        res_t, res_i = sampler.get_batch(key, batch_size=B, guide=guide)
        return {"t_leaves": res_t[0], "t_guides": res_t[2],
                "i_leaves": res_i[0], "i_guides": res_i[2]}

    def loss_fn(params, batch):
        t_out = tmodel.apply(params["tmodel"], batch["t_leaves"])
        i_out = imodel.apply(params["imodel"], batch["i_leaves"])
        targets = (batch["t_guides"], batch["i_guides"])
        loss, diag = guided_clip_loss(t_out, i_out, targets, K, B,
                                      penalty=cfg.penalty, guide=guide)
        plain = clip_loss(t_out[0], i_out[0], K, B)
        return loss, {"loss": plain, "pen0": diag}

    def init_fn(key):
        kt, ki = jax.random.split(key)
        return {"tmodel": tmodel.init(kt), "imodel": imodel.init(ki)}

    def payload_fn(params):
        return {"tmodel_state_dict": ckpt.pack_params(params["tmodel"]),
                "imodel_state_dict": ckpt.pack_params(params["imodel"])}

    def load_fn(payload):
        return {"tmodel": ckpt.unpack_params(payload["tmodel_state_dict"]),
                "imodel": ckpt.unpack_params(payload["imodel_state_dict"])}

    bayes = sampler.get_bayes(jax.random.PRNGKey(0) if bayes_key is None else bayes_key, n_bayes)
    return Task(name="clip", sample_fn=sample_fn, loss_fn=loss_fn,
                init_fn=init_fn, payload_fn=payload_fn, load_fn=load_fn,
                bayes=bayes), sampler, (tmodel, imodel)


# ----------------------------------------------------------------------
# CDM joint (reference training/train_CDNS.py)
# ----------------------------------------------------------------------
def build_cdns_task(cfg, bayes_key=None, n_bayes=10000):
    sampler = ConditionalDenoiseSampler(
        [cfg.n_ttree_layer, cfg.n_itree_layer],
        [cfg.n_ttree_child, cfg.n_itree_child],
        p_flips=[cfg.p_ttree_flip, cfg.p_itree_flip], sigma=cfg.sigma,
        flip_scale=cfg.flip_scale, variable_type=cfg.variable_type,
        translation_invariance=True, seedtree=42)
    guide = bool(cfg.guide)
    B = cfg.batch_size
    d_i = sampler.n_i_leaves
    model = ConditionalDenoiseEncoderTransformer(
        n_token=d_i + sampler.n_t_leaves, n_i_token=d_i,
        num_class=cfg.variable_type, n_embd=cfg.d_eb,
        n_layer=cfg.n_model_layer,
        n_guided_layers=[cfg.n_ttree_layer, cfg.n_itree_layer],
        n_head=cfg.n_head, n_mlp_hidden=4 * cfg.d_eb,
        activation=cfg.activation, mlp=True,
        normalize_attn=cfg.normalize_attn, layernorm=cfg.layernorm,
        maxnorm=False, sequential=False, guide=guide,
        remat=bool(getattr(cfg, 'remat', False)))

    def sample_fn(key):
        res_t, res_i = sampler.get_batch(key, batch_size=B, guide=guide)
        return {"t_leaves": res_t[0], "t_guides": res_t[2],
                "z": res_i[0], "clean": res_i[1].astype(jnp.float32),
                "i_guides": res_i[2], "posterior": res_i[3]}

    def loss_fn(params, batch):
        pred, guides = model.apply(params, batch["t_leaves"], batch["z"])
        targets = (batch["clean"], (batch["t_guides"], batch["i_guides"]))
        loss, p0, p1, p2, p3 = conditional_guided_ls_loss(
            (pred, guides), targets, penalty=cfg.penalty, guide=guide)
        aux = {"loss": ls_loss(pred, batch["clean"]),
               "pen0": p0, "pen1": p1, "pen2": p2, "pen3": p3}
        if batch["posterior"] is not None:
            aux["compare"] = ls_loss(pred, batch["posterior"])
        return loss, aux

    def payload_fn(params):
        return {"model_state_dict": ckpt.pack_params(params)}

    bayes = sampler.get_bayes(jax.random.PRNGKey(0) if bayes_key is None else bayes_key, n_bayes)
    return Task(name="cond_denoising", sample_fn=sample_fn, loss_fn=loss_fn,
                init_fn=model.init, payload_fn=payload_fn,
                load_fn=lambda p: ckpt.unpack_params(p["model_state_dict"]),
                bayes=bayes), sampler, model


# ----------------------------------------------------------------------
# VLM joint (reference training/train_NWP.py)
# ----------------------------------------------------------------------
def build_nwp_task(cfg, bayes_key=None, n_bayes=10000):
    sampler = NextWordPredictSampler(
        [cfg.n_ttree_layer, cfg.n_itree_layer],
        [cfg.n_ttree_child, cfg.n_itree_child],
        p_flips=[cfg.p_ttree_flip, cfg.p_itree_flip],
        flip_scale=cfg.flip_scale, variable_type=cfg.variable_type,
        translation_invariance=cfg.translation_invariance, seedtree=42)
    guide = bool(cfg.guide)
    B = cfg.batch_size
    d_i = sampler.n_i_leaves
    d_model = d_i + sampler.n_t_leaves - 1
    model = AutoRegressiveTransformer(
        n_token=d_model, n_i_token=d_i, num_class=cfg.variable_type,
        n_embd=cfg.d_eb, n_layer=cfg.n_model_layer,
        n_guided_layers=[cfg.n_ttree_layer, cfg.n_itree_layer],
        n_head=cfg.n_head, n_mlp_hidden=4 * cfg.d_eb, auto_regressive=True,
        activation="softmax", mlp=True, normalize_attn=cfg.normalize_attn,
        layernorm=cfg.layernorm, sequential=False, guide=guide,
        remat=bool(getattr(cfg, 'remat', False)))

    def sample_fn(key):
        res_t, res_i = sampler.get_batch(key, batch_size=B, guide=guide)
        return {"inputs": res_t[0], "targets": res_t[1], "t_guides": res_t[2],
                "pp": res_t[3], "i_leaves": res_i[0], "i_guides": res_i[2]}

    def loss_fn(params, batch):
        logits, guides = model.apply(params, batch["inputs"], batch["i_leaves"])
        targets = (batch["targets"], (batch["t_guides"], batch["i_guides"]))
        loss, p0, p1, p2, p3 = conditional_guided_ce_loss(
            (logits, guides), targets, penalty=cfg.penalty, guide=guide)
        ce = cross_entropy(logits.reshape(-1, logits.shape[-1]),
                           batch["targets"].reshape(-1))
        plain = jnp.mean(jnp.mean(ce.reshape(-1, batch["targets"].shape[1]), axis=1))
        aux = {"loss": plain,
               "pen0": p0, "pen1": p1, "pen2": p2, "pen3": p3}
        if batch["pp"] is not None:
            aux["compare"] = kl_divergence(logits, batch["pp"])
        return loss, aux

    def payload_fn(params):
        return {"model_state_dict": ckpt.pack_params(params)}

    bayes = sampler.get_bayes(jax.random.PRNGKey(0) if bayes_key is None else bayes_key, n_bayes)
    return Task(name="next_word_prediction", sample_fn=sample_fn,
                loss_fn=loss_fn, init_fn=model.init, payload_fn=payload_fn,
                load_fn=lambda p: ckpt.unpack_params(p["model_state_dict"]),
                bayes=bayes), sampler, model


# ----------------------------------------------------------------------
# Classification (reference training/train_CLS.py — which, as shipped,
# trains root classification on the *image side of an NWP sampler* with
# hard-coded tree parameters and a stubbed Bayes of 0.1; SURVEY.md
# Appendix A #5.  Reproduced for surface parity.)
# ----------------------------------------------------------------------
def build_cls_task(cfg, bayes_key=None, n_bayes=10000):
    sampler = NextWordPredictSampler(
        [4, 4], [3, 3], p_flips=[0.4, 0.4], flip_scale=1.0,
        variable_type=10, translation_invariance=True, seedtree=42)
    guide = bool(cfg.guide)
    B = cfg.batch_size
    model = EncoderTransformer(
        n_token=sampler.n_i_leaves, num_class=10, n_embd=cfg.d_eb,
        n_layer=cfg.n_model_layer, n_guided_layer=4, n_head=cfg.n_head,
        n_mlp_multiplier=4, activation=cfg.activation, mlp=True,
        normalize_attn=cfg.normalize_attn, layernorm=cfg.layernorm,
        guide=guide)

    def sample_fn(key):
        _, res_i = sampler.get_batch(key, batch_size=B, guide=guide)
        return {"leaves": res_i[0], "roots": res_i[1], "guides": res_i[2]}

    def loss_fn(params, batch):
        out, guided = model.apply(params, batch["leaves"])
        loss = guided_ce_loss((out, guided), (batch["roots"], batch["guides"]),
                              penaltys=(1.0, cfg.penalty), guide=guide)
        plain = jnp.mean(cross_entropy(out, batch["roots"]))
        return loss, {"loss": plain}

    def payload_fn(params):
        return {"model_state_dict": ckpt.pack_params(params)}

    return Task(name="classification", sample_fn=sample_fn, loss_fn=loss_fn,
                init_fn=model.init, payload_fn=payload_fn,
                load_fn=lambda p: ckpt.unpack_params(p["model_state_dict"]),
                bayes=(0.1, 0.0)), sampler, model


# ----------------------------------------------------------------------
# Frozen-CLIP loading for the sequential stacks
# ----------------------------------------------------------------------
def load_frozen_clip_encoder(tree_folder, clip_feature, side, n_token,
                             variable_type=10, logs_root="logs"):
    """Locate and load the frozen CLIP encoder for a sequential task.

    Scans ``logs/CLIP/<tree_folder>/`` choosing a ``GT``-prefixed run when
    ``clip_feature == 'GT'`` or a ``TF``+``L5`` run when ``'TF'``
    (reference ``train_sequential_DNS.py:102-117``), and instantiates the
    architecture the released CLIP checkpoints use (L5/H4/D128).
    """
    model = EncoderTransformer(
        n_token=n_token, num_class=variable_type, n_embd=128, n_layer=5,
        n_head=4, n_mlp_multiplier=4, activation="softmax", mlp=True,
        normalize_attn=True, layernorm=True, maxnorm=False, guide=False)
    clip_path = os.path.join(logs_root, "CLIP", tree_folder)
    chosen = None
    for folder in sorted(os.listdir(clip_path)):
        if clip_feature == "GT" and "GT" in folder:
            chosen = os.path.join(clip_path, folder)
            break
        if clip_feature == "TF" and "TF" in folder and "L5" in folder:
            chosen = os.path.join(clip_path, folder)
            break
    if chosen is None:
        raise FileNotFoundError(
            f"no CLIP checkpoint for feature={clip_feature} under {clip_path}")
    path = ckpt.latest_checkpoint(chosen)
    payload = ckpt.load_checkpoint(path)
    key = "tmodel_state_dict" if side == "text" else "imodel_state_dict"
    params = ckpt.unpack_params(payload[key])
    return model, params


# ----------------------------------------------------------------------
# Sequential CDM (reference training/train_sequential_DNS.py)
# ----------------------------------------------------------------------
def build_sequential_dns_task(cfg, clip_feature="GT", logs_root="logs",
                              bayes_key=None, n_bayes=10000,
                              clip_override=None):
    sampler = ConditionalDenoiseSampler(
        [cfg.n_ttree_layer, cfg.n_itree_layer],
        [cfg.n_ttree_child, cfg.n_itree_child],
        p_flips=[cfg.p_ttree_flip, cfg.p_itree_flip], sigma=cfg.sigma,
        flip_scale=cfg.flip_scale, variable_type=cfg.variable_type,
        translation_invariance=True, seedtree=42)
    guide = bool(cfg.guide)
    B = cfg.batch_size
    d_i = sampler.n_i_leaves
    tree_folder = ckpt.tree_folder_name(
        cfg.K, cfg.n_ttree_layer, cfg.n_ttree_child, cfg.p_ttree_flip,
        cfg.n_itree_layer, cfg.n_itree_child, cfg.p_itree_flip, cfg.flip_scale)
    if clip_override is not None:
        clip_model, clip_params = clip_override
    else:
        clip_model, clip_params = load_frozen_clip_encoder(
            tree_folder, clip_feature, "text", sampler.n_t_leaves,
            cfg.variable_type, logs_root)
    model = ConditionalDenoiseEncoderTransformer(
        n_token=d_i + 1, n_i_token=d_i, num_class=cfg.variable_type,
        n_embd=cfg.d_eb, n_layer=cfg.n_model_layer,
        n_guided_layers=[1, cfg.n_itree_layer], n_head=cfg.n_head,
        n_mlp_hidden=4 * cfg.d_eb, activation="softmax", mlp=True,
        normalize_attn=cfg.normalize_attn, layernorm=cfg.layernorm,
        maxnorm=False, sequential=True, guide=guide,
        remat=bool(getattr(cfg, 'remat', False)))

    def sample_fn(key):
        res_t, res_i = sampler.get_batch(key, batch_size=B, guide=guide)
        return {"t_leaves": res_t[0], "z": res_i[0],
                "clean": res_i[1].astype(jnp.float32),
                "i_guides": res_i[2], "posterior": res_i[3]}

    def loss_fn(params, batch):
        feat = clip_model.apply(clip_params, batch["t_leaves"])[0]
        feat = jax.lax.stop_gradient(feat)[:, None, :]  # [B, 1, V]
        pred, guides = model.apply(params, feat, batch["z"])
        t_targets = (feat, feat)  # reference train_sequential_DNS.py:165
        targets = (batch["clean"], (t_targets, batch["i_guides"]))
        loss, p0, p1, p2, p3 = conditional_guided_ls_loss(
            (pred, guides), targets, penalty=cfg.penalty, guide=guide)
        aux = {"loss": ls_loss(pred, batch["clean"]),
               "pen0": p0, "pen1": p1, "pen2": p2, "pen3": p3}
        if batch["posterior"] is not None:
            aux["compare"] = ls_loss(pred, batch["posterior"])
        return loss, aux

    def payload_fn(params):
        return {"model_state_dict": ckpt.pack_params(params)}

    bayes = sampler.get_bayes(jax.random.PRNGKey(0) if bayes_key is None else bayes_key, n_bayes)
    return Task(name="Sequential_CDNS", sample_fn=sample_fn, loss_fn=loss_fn,
                init_fn=model.init, payload_fn=payload_fn,
                load_fn=lambda p: ckpt.unpack_params(p["model_state_dict"]),
                bayes=bayes), sampler, model


# ----------------------------------------------------------------------
# Sequential VLM (reference training/train_sequential_NWP.py)
# ----------------------------------------------------------------------
def build_sequential_nwp_task(cfg, clip_feature="GT", logs_root="logs",
                              bayes_key=None, n_bayes=10000, raw=True,
                              clip_override=None):
    sampler = NextWordPredictSampler(
        [cfg.n_ttree_layer, cfg.n_itree_layer],
        [cfg.n_ttree_child, cfg.n_itree_child],
        p_flips=[cfg.p_ttree_flip, cfg.p_itree_flip],
        flip_scale=cfg.flip_scale, variable_type=cfg.variable_type,
        translation_invariance=True, seedtree=42)
    guide = bool(cfg.guide)
    B = cfg.batch_size
    tree_folder = ckpt.tree_folder_name(
        cfg.K, cfg.n_ttree_layer, cfg.n_ttree_child, cfg.p_ttree_flip,
        cfg.n_itree_layer, cfg.n_itree_child, cfg.p_itree_flip, cfg.flip_scale)
    if clip_override is not None:
        clip_model, clip_params = clip_override
    else:
        clip_model, clip_params = load_frozen_clip_encoder(
            tree_folder, clip_feature, "image", sampler.n_i_leaves,
            cfg.variable_type, logs_root)
    model = AutoRegressiveTransformer(
        n_token=sampler.n_t_leaves, n_i_token=1, num_class=cfg.variable_type,
        n_embd=cfg.d_eb, n_layer=cfg.n_model_layer,
        n_guided_layers=[cfg.n_ttree_layer, 1], n_head=cfg.n_head,
        n_mlp_hidden=4 * cfg.d_eb, auto_regressive=True,
        activation="softmax", mlp=True, normalize_attn=cfg.normalize_attn,
        layernorm=cfg.layernorm, sequential=True, guide=guide,
        remat=bool(getattr(cfg, 'remat', False)))

    def sample_fn(key):
        res_t, res_i = sampler.get_batch(key, batch_size=B, guide=guide)
        return {"inputs": res_t[0], "targets": res_t[1], "t_guides": res_t[2],
                "pp": res_t[3], "i_leaves": res_i[0]}

    def loss_fn(params, batch):
        feat = clip_model.apply(clip_params, batch["i_leaves"])[0]
        feat = jax.lax.stop_gradient(feat)[:, None, :]
        logits, guides = model.apply(params, batch["inputs"], feat)
        i_targets = (feat, feat)  # reference train_sequential_NWP.py:165
        targets = (batch["targets"], (batch["t_guides"], i_targets))
        loss, p0, p1, p2, p3 = conditional_guided_ce_loss(
            (logits, guides), targets, penalty=cfg.penalty, guide=guide)
        ce = cross_entropy(logits.reshape(-1, logits.shape[-1]),
                           batch["targets"].reshape(-1))
        plain = jnp.mean(jnp.mean(ce.reshape(-1, batch["targets"].shape[1]), axis=1))
        aux = {"loss": plain,
               "pen0": p0, "pen1": p1, "pen2": p2, "pen3": p3}
        if batch["pp"] is not None:
            aux["compare"] = kl_divergence(logits, batch["pp"])
        return loss, aux

    def payload_fn(params):
        return {"model_state_dict": ckpt.pack_params(params)}

    # Bayes is only computed for persistent runs (reference :78-84).
    bayes = ((0.0, 0.0) if raw else sampler.get_bayes(
        jax.random.PRNGKey(0) if bayes_key is None else bayes_key, n_bayes))
    return Task(name="Sequential_NWP", sample_fn=sample_fn, loss_fn=loss_fn,
                init_fn=model.init, payload_fn=payload_fn,
                load_fn=lambda p: ckpt.unpack_params(p["model_state_dict"]),
                bayes=bayes), sampler, model
