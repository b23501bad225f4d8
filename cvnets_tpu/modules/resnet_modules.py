"""ResNet blocks (parity: reference cvnets/modules/resnet_modules.py:16-298)."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.layers.random_layers import StochasticDepth
from cvnets_tpu.modules.squeeze_excitation import SqueezeExcitation


class BasicResNetBlock(nn.Module):
    opts: Any
    in_channels: int
    mid_channels: int
    out_channels: int
    stride: int = 1
    dilation: int = 1
    squeeze_channels: Optional[int] = None
    stochastic_depth_prob: float = 0.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        y = ConvLayer2d(opts=self.opts, out_channels=self.mid_channels, kernel_size=3,
                        stride=self.stride, dilation=self.dilation,
                        use_norm=True, use_act=True, name="conv1")(x, training=training)
        y = ConvLayer2d(opts=self.opts, out_channels=self.out_channels, kernel_size=3,
                        dilation=self.dilation, use_norm=True, use_act=False,
                        name="conv2")(y, training=training)
        if 0.0 < self.dropout < 1.0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)
        if self.squeeze_channels:
            y = SqueezeExcitation(opts=self.opts, in_channels=self.out_channels,
                                  squeeze_channels=self.squeeze_channels,
                                  scale_fn_name="sigmoid", name="se")(y)
        if self.stride != 1 or self.in_channels != self.out_channels:
            x = ConvLayer2d(opts=self.opts, out_channels=self.out_channels,
                            kernel_size=1, stride=self.stride, use_norm=True,
                            use_act=False, name="down")(x, training=training)
        if self.stochastic_depth_prob > 0:
            y = StochasticDepth(p=self.stochastic_depth_prob)(y, training=training)
        from cvnets_tpu.layers.activation import build_act_layer

        return build_act_layer(self.opts)(x + y)


class BottleneckResNetBlock(nn.Module):
    opts: Any
    in_channels: int
    mid_channels: int
    out_channels: int
    stride: int = 1
    dilation: int = 1
    squeeze_channels: Optional[int] = None
    stochastic_depth_prob: float = 0.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        y = ConvLayer2d(opts=self.opts, out_channels=self.mid_channels, kernel_size=1,
                        use_norm=True, use_act=True, name="conv1")(x, training=training)
        y = ConvLayer2d(opts=self.opts, out_channels=self.mid_channels, kernel_size=3,
                        stride=self.stride, dilation=self.dilation,
                        use_norm=True, use_act=True, name="conv2")(y, training=training)
        y = ConvLayer2d(opts=self.opts, out_channels=self.out_channels, kernel_size=1,
                        use_norm=True, use_act=False, name="conv3")(y, training=training)
        if 0.0 < self.dropout < 1.0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)
        if self.squeeze_channels:
            y = SqueezeExcitation(opts=self.opts, in_channels=self.out_channels,
                                  squeeze_channels=self.squeeze_channels,
                                  scale_fn_name="sigmoid", name="se")(y)
        if self.stride != 1 or self.in_channels != self.out_channels:
            x = ConvLayer2d(opts=self.opts, out_channels=self.out_channels,
                            kernel_size=1, stride=self.stride, use_norm=True,
                            use_act=False, name="down")(x, training=training)
        if self.stochastic_depth_prob > 0:
            y = StochasticDepth(p=self.stochastic_depth_prob)(y, training=training)
        from cvnets_tpu.layers.activation import build_act_layer

        return build_act_layer(self.opts)(x + y)
