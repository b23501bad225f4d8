"""ASPP (parity: reference cvnets/modules/aspp_block.py:24-248): parallel 1×1,
three dilated 3×3 (or separable) branches and a global-pool branch, concatenated and
projected. Used by DeepLabv3."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cvnets_tpu.layers.conv_layer import ConvLayer2d, SeparableConv2d


class ASPP(nn.Module):
    opts: Any
    out_channels: int = 256
    atrous_rates: Sequence[int] = (6, 12, 18)
    is_sep_conv: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        branches = [
            ConvLayer2d(opts=self.opts, out_channels=self.out_channels,
                        kernel_size=1, use_norm=True, use_act=True,
                        name="conv_1x1")(x, training=training)
        ]
        for i, rate in enumerate(self.atrous_rates):
            if self.is_sep_conv:
                b = SeparableConv2d(opts=self.opts, in_channels=in_ch,
                                    out_channels=self.out_channels, kernel_size=3,
                                    dilation=rate, use_norm=True, use_act=True,
                                    name=f"aspp_sep_{i}")(x, training=training)
            else:
                b = ConvLayer2d(opts=self.opts, out_channels=self.out_channels,
                                kernel_size=3, dilation=rate, use_norm=True,
                                use_act=True, name=f"aspp_rate_{i}")(x,
                                                                     training=training)
            branches.append(b)
        # global pooling branch
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = ConvLayer2d(opts=self.opts, out_channels=self.out_channels,
                         kernel_size=1, use_norm=True, use_act=True,
                         name="aspp_pool")(gp, training=training)
        gp = jnp.broadcast_to(gp, branches[0].shape)
        branches.append(gp)

        y = jnp.concatenate(branches, axis=-1)
        y = ConvLayer2d(opts=self.opts, out_channels=self.out_channels,
                        kernel_size=1, use_norm=True, use_act=True,
                        name="project")(y, training=training)
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)
        return y
