"""Cross-framework checkpoint interop check.

Loads a ghm_tpu-trained CLIP checkpoint into the *reference* torch
EncoderTransformer and compares its forward outputs against the ghm_tpu
model on the same inputs — proving the released-artifact compatibility claim
in both directions.

Run: python tools/check_ref_interop.py <path/to/checkpoint.pth>
"""

import sys

import numpy as np

REF_SRC = "/root/reference/src"


def main(path):
    import torch

    sys.path.insert(0, REF_SRC)
    from ghmclip.models.model import EncoderTransformer as RefEncoder

    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ghm_tpu.models import EncoderTransformer
    from ghm_tpu.utils.checkpoint import load_checkpoint, unpack_params

    ckpt = load_checkpoint(path)
    ref = RefEncoder(n_token=81, num_class=10, n_embd=128, n_layer=5,
                     n_guided_layer=4, n_head=4, n_mlp_multiplier=4,
                     activation="softmax", mlp=True, normalize_attn=True,
                     layernorm=True, guide=False)
    sd = {k: torch.as_tensor(np.asarray(v))
          for k, v in ckpt["tmodel_state_dict"].items()}
    missing, unexpected = ref.load_state_dict(sd, strict=True), None
    print("reference load_state_dict: OK (strict)")

    ours = EncoderTransformer(n_token=81, num_class=10, n_embd=128, n_layer=5,
                              n_guided_layer=4, n_head=4, n_mlp_multiplier=4,
                              activation="softmax", mlp=True,
                              normalize_attn=True, layernorm=True, guide=False)
    params = unpack_params(ckpt["tmodel_state_dict"])

    rng = np.random.RandomState(0)
    x = rng.randint(0, 10, (16, 81))
    with torch.no_grad():
        ref_out, _ = ref(torch.as_tensor(x))
    our_out, _ = ours.apply(params, jnp.asarray(x))
    diff = np.abs(np.asarray(our_out) - ref_out.numpy()).max()
    print(f"forward max |diff| torch-vs-jax on shared weights: {diff:.2e}")
    assert diff < 1e-3, diff
    print("interop check PASSED")


if __name__ == "__main__":
    main(sys.argv[1])
