"""Atomic layers (parity: reference cvnets/layers/*) as flax.linen modules.

TPU design notes:
* All image tensors are NHWC (channels-last is the native TPU layout; the reference's
  ``--common.channels-last`` flag becomes a no-op).
* Normalization/activation/initializer choices are read from ``opts`` via the factory
  helpers here, mirroring the reference's ``get_normalization_layer`` /
  ``build_activation_layer`` contract (reference cvnets/layers/normalization_layers.py,
  cvnets/layers/activation/__init__.py).
"""

import argparse

from cvnets_tpu.layers.activation import (
    build_act_layer,
    arguments_activation_fn,
    SUPPORTED_ACT_FNS,
)
from cvnets_tpu.layers.conv_layer import (
    ConvLayer2d,
    NormActLayer,
    SeparableConv2d,
    TransposeConvLayer2d,
)
from cvnets_tpu.layers.linear_layer import GroupLinear, LinearLayer
from cvnets_tpu.layers.normalization import (
    AdjustBatchNormMomentum,
    arguments_norm_layers,
    get_normalization_layer,
    SUPPORTED_NORM_FNS,
)
from cvnets_tpu.layers.pool import GlobalPool, MaxPool2d, AvgPool2d
from cvnets_tpu.layers.positional_embedding import PositionalEmbedding
from cvnets_tpu.layers.random_layers import RandomApply, StochasticDepth
from cvnets_tpu.layers.embedding import Embedding
from cvnets_tpu.layers.token_merging import TokenMerging
from cvnets_tpu.layers.init_utils import arguments_weight_init, get_initializer


def layer_specific_arguments(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """Aggregate layer-level flags (global pool, init scheme; reference
    cvnets/layers/__init__.py)."""
    group = parser.add_argument_group(title="Layer arguments")
    group.add_argument(
        "--model.layer.global-pool", type=str, default="mean",
        help="Global pooling type: mean, rms, or abs",
    )
    parser = arguments_weight_init(parser)
    parser = arguments_norm_layers(parser)
    parser = arguments_activation_fn(parser)
    return parser
