"""Squeeze-and-excitation (parity: reference cvnets/modules/squeeze_excitation.py:17)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.activation import build_act_layer
from cvnets_tpu.layers.dtype_utils import compute_dtype
from cvnets_tpu.layers.init_utils import conv_init
from cvnets_tpu.utils.math_utils import make_divisible


class SqueezeExcitation(nn.Module):
    opts: Any
    in_channels: int
    squeeze_factor: int = 4
    scale_fn_name: str = "sigmoid"
    act_name: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        squeeze_ch = make_divisible(self.in_channels // self.squeeze_factor, 8)
        init = conv_init(self.opts)
        dt = compute_dtype(self.opts)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)  # NHWC global pool
        s = nn.Conv(squeeze_ch, (1, 1), use_bias=True, kernel_init=init, dtype=dt,
                    name="fc1")(s)
        s = build_act_layer(self.opts, act_name=self.act_name)(s)
        s = nn.Conv(self.in_channels, (1, 1), use_bias=True, kernel_init=init, dtype=dt,
                    name="fc2")(s)
        s = build_act_layer(self.opts, act_name=self.scale_fn_name)(s)
        return x * s
