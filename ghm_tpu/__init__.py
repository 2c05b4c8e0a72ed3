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
