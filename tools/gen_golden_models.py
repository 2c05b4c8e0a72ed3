"""Generate model-forward golden fixtures from the reference torch models.

Instantiates the reference transformer family from /root/reference with fixed
seeds, records the state_dict, inputs, outputs, and guided-layer outputs into
tests/golden/*.npz so the ghm_tpu functional models can be verified
weight-for-weight without torch in the test hot path.

Run: python tools/gen_golden_models.py
"""

import os
import sys

import numpy as np
import torch

REF_SRC = "/root/reference/src"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def dump_state_dict(model):
    return {f"sd__{k.replace('.', '__')}": v.detach().numpy()
            for k, v in model.state_dict().items()}


def main():
    sys.path.insert(0, REF_SRC)
    from ghmclip.models.model import (
        EncoderTransformer,
        AutoRegressiveTransformer,
        ConditionalDenoiseEncoderTransformer,
        DenoiseEncoderTransformer,
    )

    os.makedirs(OUT_DIR, exist_ok=True)
    torch.manual_seed(0)
    B, V = 4, 10

    # --- EncoderTransformer (guided, softmax attention) ------------------
    enc = EncoderTransformer(n_token=27, num_class=V, n_embd=64, n_layer=5,
                             n_guided_layer=3, n_head=4, n_mlp_multiplier=4,
                             activation="softmax", mlp=True,
                             normalize_attn=True, layernorm=True, guide=True)
    x = torch.randint(0, V, (B, 27))
    with torch.no_grad():
        out, guided = enc(x)
    np.savez(os.path.join(OUT_DIR, "model_encoder.npz"),
             x=x.numpy(), out=out.numpy(),
             **{f"guided{i}": g.numpy() for i, g in enumerate(guided)},
             **dump_state_dict(enc))

    # Relu-attention / no-normalize variant exercises the activation axis.
    enc2 = EncoderTransformer(n_token=27, num_class=V, n_embd=64, n_layer=2,
                              n_guided_layer=2, n_head=4, activation="relu",
                              normalize_attn=False, layernorm=False, guide=False)
    with torch.no_grad():
        out2, _ = enc2(x)
    np.savez(os.path.join(OUT_DIR, "model_encoder_relu.npz"),
             x=x.numpy(), out=out2.numpy(), **dump_state_dict(enc2))

    # --- AutoRegressiveTransformer (joint, guided) -----------------------
    ar = AutoRegressiveTransformer(n_token=53, n_i_token=27, num_class=V,
                                   n_embd=128, n_layer=7, n_guided_layers=[3, 3],
                                   n_head=4, n_mlp_hidden=512,
                                   activation="softmax", mlp=True,
                                   normalize_attn=True, auto_regressive=True,
                                   sequential=False, layernorm=True, guide=True)
    xt = torch.randint(0, V, (B, 26))
    zi = torch.randint(0, V, (B, 27))
    with torch.no_grad():
        out, (tg, ig) = ar(xt, zi)
    np.savez(os.path.join(OUT_DIR, "model_ar_joint.npz"),
             xt=xt.numpy(), zi=zi.numpy(), out=out.numpy(),
             **{f"tg{i}": g.numpy() for i, g in enumerate(tg)},
             **{f"ig{i}": g.numpy() for i, g in enumerate(ig)},
             **dump_state_dict(ar))

    # --- AutoRegressiveTransformer (sequential: CLIP-feature prefix) -----
    ars = AutoRegressiveTransformer(n_token=27, n_i_token=1, num_class=V,
                                    n_embd=128, n_layer=5, n_guided_layers=[3, 1],
                                    n_head=4, n_mlp_hidden=512,
                                    activation="softmax", mlp=True,
                                    normalize_attn=True, auto_regressive=True,
                                    sequential=True, layernorm=True, guide=False)
    xt_s = torch.randint(0, V, (B, 26))
    feat = torch.randn(B, 1, V)
    with torch.no_grad():
        out_s, _ = ars(xt_s, feat)
    np.savez(os.path.join(OUT_DIR, "model_ar_seq.npz"),
             xt=xt_s.numpy(), zi=feat.numpy(), out=out_s.numpy(),
             **dump_state_dict(ars))

    # --- ConditionalDenoiseEncoderTransformer (joint, guided) ------------
    cdm = ConditionalDenoiseEncoderTransformer(
        n_token=54, n_i_token=27, num_class=V, n_embd=128, n_layer=7,
        n_guided_layers=[3, 3], n_head=4, n_mlp_hidden=512,
        activation="softmax", mlp=True, normalize_attn=True,
        auto_regressive=False, sequential=False, layernorm=True,
        maxnorm=False, guide=True, sigma=1)
    xt_c = torch.randint(0, V, (B, 27))
    zi_c = torch.randn(B, 27) * 1.0 + torch.randint(0, V, (B, 27)).float()
    with torch.no_grad():
        out_c, (tg_c, ig_c) = cdm(xt_c, zi_c)
    np.savez(os.path.join(OUT_DIR, "model_cdm_joint.npz"),
             xt=xt_c.numpy(), zi=zi_c.numpy(), out=out_c.numpy(),
             **{f"tg{i}": g.numpy() for i, g in enumerate(tg_c)},
             **{f"ig{i}": g.numpy() for i, g in enumerate(ig_c)},
             **dump_state_dict(cdm))

    # --- ConditionalDenoiseEncoderTransformer (sequential) ---------------
    cdms = ConditionalDenoiseEncoderTransformer(
        n_token=28, n_i_token=27, num_class=V, n_embd=128, n_layer=3,
        n_guided_layers=[1, 3], n_head=4, n_mlp_hidden=512,
        activation="softmax", mlp=True, normalize_attn=True,
        sequential=True, layernorm=True, maxnorm=False, guide=False, sigma=1)
    feat_c = torch.randn(B, 1, V)
    with torch.no_grad():
        out_cs, _ = cdms(feat_c, zi_c)
    np.savez(os.path.join(OUT_DIR, "model_cdm_seq.npz"),
             xt=feat_c.numpy(), zi=zi_c.numpy(), out=out_cs.numpy(),
             **dump_state_dict(cdms))

    # --- DenoiseEncoderTransformer (unguided; guided path is broken in the
    # reference, SURVEY.md Appendix A #4) ---------------------------------
    dns = DenoiseEncoderTransformer(n_token=27, num_class=V, n_embd=64,
                                    n_layer=4, n_tree_layer=3, n_tree_child=3,
                                    n_guided_layer=2, n_head=4, n_mlp_hidden=256,
                                    activation="softmax", mlp=True,
                                    normalize_attn=True, layernorm=True,
                                    maxnorm=True, guide=False, sigma=1)
    with torch.no_grad():
        out_d = dns(zi_c)
    np.savez(os.path.join(OUT_DIR, "model_dns.npz"),
             zi=zi_c.numpy(), out=out_d.numpy(), **dump_state_dict(dns))

    print("model fixtures written")
    for f in sorted(os.listdir(OUT_DIR)):
        if f.startswith("model_"):
            print(" ", f, os.path.getsize(os.path.join(OUT_DIR, f)))


if __name__ == "__main__":
    main()
