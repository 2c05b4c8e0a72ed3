"""Model family, losses, and functional building blocks."""

from ghm_tpu.models.transformer import (
    EncoderTransformer,
    AutoRegressiveTransformer,
    ConditionalDenoiseEncoderTransformer,
    DenoiseEncoderTransformer,
)
from ghm_tpu.models.resnet import ResNet
from ghm_tpu.models import losses
from ghm_tpu.models.layers import (
    generate_mask,
    get_activation,
    prefix_lm_mask,
    seed_everything,
)

__all__ = [
    "EncoderTransformer",
    "AutoRegressiveTransformer",
    "ConditionalDenoiseEncoderTransformer",
    "DenoiseEncoderTransformer",
    "ResNet",
    "losses",
    "generate_mask",
    "get_activation",
    "prefix_lm_mask",
    "seed_everything",
]
