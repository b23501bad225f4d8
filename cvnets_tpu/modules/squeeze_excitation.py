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
    # explicit override; default follows the reference rule
    # max(make_divisible(C // factor, 8), 32) (squeeze_excitation.py:43-44)
    squeeze_channels: Any = None
    scale_fn_name: str = "sigmoid"
    # None -> the model's default activation (reference squeeze_excitation.py:46-55
    # builds fc1 with use_act=True, i.e. opts model.activation.name)
    act_name: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        squeeze_ch = self.squeeze_channels
        if squeeze_ch is None:
            squeeze_ch = max(
                make_divisible(self.in_channels // self.squeeze_factor, 8), 32)
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
