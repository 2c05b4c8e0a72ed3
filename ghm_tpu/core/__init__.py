"""Numerical core: GHM transitions, on-device tree sampling, exact BP."""

from ghm_tpu.core.transitions import (
    gen_transition,
    transitions_to_device,
    n_nodes_per_layer,
    softmax_rows,
)
from ghm_tpu.core.tree import sample_tree, sample_root
from ghm_tpu.core.bp import (
    BPClsResult,
    BPDnsResult,
    bp_cls,
    bp_dns,
    bp_nwp_autoregressive,
    bp_nwp_single_position,
    guided_cls,
    guided_dns,
)

__all__ = [
    "gen_transition",
    "transitions_to_device",
    "n_nodes_per_layer",
    "softmax_rows",
    "sample_tree",
    "sample_root",
    "BPClsResult",
    "BPDnsResult",
    "bp_cls",
    "bp_dns",
    "bp_nwp_autoregressive",
    "bp_nwp_single_position",
    "guided_cls",
    "guided_dns",
]
