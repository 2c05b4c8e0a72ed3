"""Task samplers producing on-device GHM batches with exact BP targets."""

from ghm_tpu.data.samplers import (
    SingleTreeSampler,
    DoubleTreeSampler,
    ClassificationSampler,
    DenoiseSampler,
    ClipSampler,
    ConditionalDenoiseSampler,
    NextWordPredictSampler,
    bayes_clip_loss,
)

__all__ = [
    "SingleTreeSampler",
    "DoubleTreeSampler",
    "ClassificationSampler",
    "DenoiseSampler",
    "ClipSampler",
    "ConditionalDenoiseSampler",
    "NextWordPredictSampler",
    "bayes_clip_loss",
]
