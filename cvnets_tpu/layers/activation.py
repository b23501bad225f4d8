"""Activation registry (parity: reference cvnets/layers/activation/* — 10 modules).

Activations are plain jnp callables (XLA fuses them into the surrounding matmul/conv,
so module wrappers would add nothing on TPU). PReLU, which has parameters, is a linen
module.
"""

from __future__ import annotations

import argparse
from functools import partial
from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import jax


def _hard_sigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


def _hard_swish(x):
    return x * _hard_sigmoid(x)


SUPPORTED_ACT_FNS = {
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "leaky_relu": partial(jax.nn.leaky_relu, negative_slope=0.1),
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "gelu": partial(jax.nn.gelu, approximate=False),
    "hard_swish": _hard_swish,
    "hard_sigmoid": _hard_sigmoid,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "prelu": None,  # parametric; see PReLU module below
}


class PReLU(nn.Module):
    """Parametric ReLU with a learnable per-channel (or shared) negative slope."""

    num_parameters: int = 1
    init_value: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda _key: jnp.full((self.num_parameters,), self.init_value)
        )
        return jnp.where(x >= 0, x, alpha * x)


def build_act_layer(
    opts, act_name: Optional[str] = None, prefix: str = "model.activation"
) -> Callable:
    """Return the activation callable selected by opts (or an explicit name).

    Parity: reference cvnets/layers/activation/__init__.py:115 (build_activation_layer).
    """
    if act_name is None:
        act_name = getattr(opts, f"{prefix}.name", "relu") or "relu"
    act_name = act_name.lower()
    if act_name == "prelu":
        return PReLU()
    if act_name in ("none", "identity", "linear"):
        return lambda x: x
    if act_name == "leaky_relu":
        neg_slope = getattr(opts, f"{prefix}.neg_slope", 0.1)
        return partial(jax.nn.leaky_relu, negative_slope=neg_slope)
    if act_name not in SUPPORTED_ACT_FNS:
        from cvnets_tpu.utils import logger

        logger.error(
            f"Unsupported activation `{act_name}`. Supported: {sorted(SUPPORTED_ACT_FNS)}"
        )
    return SUPPORTED_ACT_FNS[act_name]


def arguments_activation_fn(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Non-linearity arguments")
    group.add_argument("--model.activation.name", type=str, default="relu")
    group.add_argument("--model.activation.inplace", action="store_true",
                       help="Inert on TPU (XLA is functional); config-compat only")
    group.add_argument("--model.activation.neg-slope", type=float, default=0.1)
    return parser
