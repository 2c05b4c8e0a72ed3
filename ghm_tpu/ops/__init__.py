"""Pallas TPU kernels for hot ops (opt-in; XLA fusions are the default path)."""

from ghm_tpu.ops.tree_sampler import sample_tree_pallas

__all__ = ["sample_tree_pallas"]
