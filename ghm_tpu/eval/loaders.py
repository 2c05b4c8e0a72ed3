"""Checkpoint → model loaders for the evaluation layer.

Instantiates ghm_tpu models with the architectures the released checkpoint
families use (reference ``figures/eval-*-{risk,ood}.py`` loaders) and loads
weights from reference-schema ``checkpoint.pth`` files — which both ghm_tpu
training runs and the upstream-released artifacts produce.
"""

from __future__ import annotations

from ghm_tpu.eval.paths import latest_checkpoint
from ghm_tpu.models import (
    AutoRegressiveTransformer,
    ConditionalDenoiseEncoderTransformer,
    EncoderTransformer,
)
from ghm_tpu.utils.checkpoint import load_checkpoint, unpack_params

CLIP_VARIANTS = {
    "Standard TF": "TF_L5H4D128_L5H4D128",
    "Guided TF": "GT_L5H4D128_L5H4D128",
    "Shallow TF": "TF_L1H4D128_L1H4D128",
}
CDM_VARIANTS = {
    "Standard TF": "StT_L9H4D128",
    "Guided TF": "GT_L9H4D128",
    "Shallow TF": "ShT_L1H4D128",
    "Joint Training": "JT_L9H4D128",
}
VLM_VARIANTS = {
    "Standard TF": "StT_L9H4D256",
    "Guided TF": "GT_L9H4D256",
    "Shallow TF": "ShT_L1H4D256",
    "Joint Training": "JT_L9H4D256",
}


def _encoder(n_layer, n_token=81, n_embd=128):
    return EncoderTransformer(n_token=n_token, num_class=10, n_embd=n_embd,
                              n_layer=n_layer, n_guided_layer=n_layer,
                              n_head=4, n_mlp_multiplier=4,
                              activation="softmax", mlp=True,
                              normalize_attn=True, layernorm=True, guide=False)


def load_clip_pair(path_run, model_name):
    """Load a (text, image) encoder pair from a CLIP run folder.

    Reference ``figures/eval-zsc-risk.py:21-60``.
    """
    ckpt = load_checkpoint(latest_checkpoint(path_run))
    n_layer = 1 if model_name == "Shallow TF" else 5
    tmodel, imodel = _encoder(n_layer), _encoder(n_layer)
    t_params = unpack_params(ckpt["tmodel_state_dict"])
    i_params = unpack_params(ckpt["imodel_state_dict"])
    return (tmodel, t_params), (imodel, i_params)


def load_clip_encoder(path_run, side):
    """Load one frozen CLIP encoder (L5/H4/D128) for sequential models.

    Reference ``figures/eval-cdm-ood.py:36-46`` / ``eval-vlm-ood.py:35-45``.
    """
    ckpt = load_checkpoint(latest_checkpoint(path_run))
    model = _encoder(5)
    key = "tmodel_state_dict" if side == "text" else "imodel_state_dict"
    return model, unpack_params(ckpt[key])


def load_cdm_model(path_run, model_name):
    """Load one CDM variant (reference ``eval-cdm-ood.py:48-72``)."""
    ckpt = load_checkpoint(latest_checkpoint(path_run))
    n_layer = 1 if model_name == "Shallow TF" else 9
    joint = model_name in ("Joint Training", "Guided TF")
    model = ConditionalDenoiseEncoderTransformer(
        n_token=162 if joint else 82, n_i_token=81, num_class=10,
        n_embd=128, n_layer=n_layer, n_guided_layers=[1, 1], n_head=4,
        n_mlp_hidden=512, activation="softmax", mlp=True,
        normalize_attn=True, sequential=not joint, layernorm=True,
        maxnorm=False, guide=False)
    return model, unpack_params(ckpt["model_state_dict"])


def load_vlm_model(path_run, model_name):
    """Load one VLM variant (reference ``eval-vlm-ood.py:47-72``)."""
    ckpt = load_checkpoint(latest_checkpoint(path_run))
    n_layer = 1 if model_name == "Shallow TF" else 9
    joint = model_name in ("Joint Training", "Guided TF")
    n_token = 161 if joint else 81
    model = AutoRegressiveTransformer(
        n_token=n_token, n_i_token=n_token - 80, num_class=10, n_embd=256,
        n_layer=n_layer, n_guided_layers=[1, 1], n_head=4, n_mlp_hidden=1024,
        auto_regressive=True, activation="softmax", mlp=True,
        normalize_attn=True, sequential=not joint, layernorm=True,
        guide=False)
    return model, unpack_params(ckpt["model_state_dict"])


def load_history(path_run):
    """Final 100-step training-loss mean + Bayes from a checkpoint
    (reference ``eval-clip-risk.py:22-29``)."""
    ckpt = load_checkpoint(latest_checkpoint(path_run))
    import numpy as np

    hist = np.asarray(ckpt["loss_history"])
    return float(hist[-100:].mean()), float(ckpt["bayes"])
