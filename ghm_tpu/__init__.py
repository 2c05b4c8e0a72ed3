"""ghm_tpu — a TPU-native (JAX/XLA/Pallas) framework for multimodal learning
on Generative Hierarchical Models.

A ground-up rebuild of the capabilities of willcai7/Multimodal-GHM (the
official implementation of "A Statistical Theory of Contrastive Pre-training
and Multimodal Generative AI", arXiv:2501.04641): online GHM tree sampling,
exact belief-propagation Bayes baselines, and the CLIP / ZSC / CDM / VLM task
suite — redesigned as pure-functional, jit-compiled array programs where data
generation, inference targets, model forward/backward, and the optimizer all
run in a single compiled step on TPU, sharded over a device mesh.
"""

__version__ = "0.1.0"

# Some environments pre-import jax at interpreter startup (sitecustomize
# registering a remote-TPU platform) and force the platform via jax.config,
# which silently overrides the user's JAX_PLATFORMS env var.  Re-assert the
# env var here so `JAX_PLATFORMS=cpu python -m ghm_tpu...` behaves as
# documented.  Safe as long as no backend has been initialized yet.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        if _jax.config.jax_platforms != _os.environ["JAX_PLATFORMS"]:
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - defensive; jax may be absent
        pass
