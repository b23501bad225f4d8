"""Weight initializer selection (parity: reference cvnets/misc/init_utils.py)."""

from __future__ import annotations

import argparse

import flax.linen as nn
import jax.numpy as jnp

SUPPORTED_INIT = ("kaiming_normal", "kaiming_uniform", "xavier_normal",
                  "xavier_uniform", "normal", "trunc_normal")


def get_initializer(name: str, std: float = 0.01):
    name = (name or "kaiming_normal").lower()
    if name == "kaiming_normal":
        return nn.initializers.he_normal()
    if name == "kaiming_uniform":
        return nn.initializers.he_uniform()
    if name == "xavier_normal":
        return nn.initializers.xavier_normal()
    if name == "xavier_uniform":
        return nn.initializers.xavier_uniform()
    if name == "normal":
        return nn.initializers.normal(stddev=std)
    if name == "trunc_normal":
        return nn.initializers.truncated_normal(stddev=std)
    from cvnets_tpu.utils import logger

    logger.error(f"Unsupported initializer {name}; supported: {SUPPORTED_INIT}")


def conv_init(opts):
    return get_initializer(
        getattr(opts, "model.layer.conv_init", "kaiming_normal"),
        getattr(opts, "model.layer.conv_init_std_dev", 0.01) or 0.01,
    )


def linear_init(opts):
    return get_initializer(
        getattr(opts, "model.layer.linear_init", "normal"),
        getattr(opts, "model.layer.linear_init_std_dev", 0.01) or 0.01,
    )


def group_linear_init(opts):
    """GroupLinear weights use their own init flags (reference
    init_utils.py:116-119)."""
    return get_initializer(
        getattr(opts, "model.layer.group_linear_init", "normal"),
        getattr(opts, "model.layer.group_linear_init_std_dev", 0.01) or 0.01,
    )


def arguments_weight_init(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Weight initialization arguments")
    group.add_argument("--model.layer.conv-init", type=str, default="kaiming_normal")
    group.add_argument("--model.layer.conv-init-std-dev", type=float, default=None)
    group.add_argument("--model.layer.linear-init", type=str, default="normal")
    group.add_argument("--model.layer.linear-init-std-dev", type=float, default=0.01)
    group.add_argument("--model.layer.group-linear-init", type=str, default="normal")
    group.add_argument("--model.layer.group-linear-init-std-dev", type=float, default=0.01)
    return parser
