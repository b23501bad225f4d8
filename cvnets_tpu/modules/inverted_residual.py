"""Inverted residual blocks (parity: reference cvnets/modules/mobilenetv2.py:16-246).

``InvertedResidual`` = expand 1×1 → depthwise 3×3 → project 1×1 (+skip);
``InvertedResidualSE`` adds squeeze-excitation between depthwise and projection
(MobileNetV3 / EfficientNet style).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.modules.squeeze_excitation import SqueezeExcitation
from cvnets_tpu.utils.math_utils import make_divisible


class InvertedResidual(nn.Module):
    opts: Any
    in_channels: int
    out_channels: int
    stride: int = 1
    expand_ratio: float = 6.0
    dilation: int = 1
    skip_connection: bool = True
    act_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        hidden_dim = make_divisible(round(self.in_channels * self.expand_ratio), 8)
        use_res = (
            self.stride == 1
            and self.in_channels == self.out_channels
            and self.skip_connection
        )
        y = x
        if self.expand_ratio != 1:
            y = ConvLayer2d(
                opts=self.opts, out_channels=hidden_dim, kernel_size=1,
                use_norm=True, use_act=True, act_name=self.act_name, name="exp_1x1",
            )(y, training=training)
        y = ConvLayer2d(
            opts=self.opts, out_channels=hidden_dim, kernel_size=3,
            stride=self.stride, dilation=self.dilation, groups=hidden_dim,
            use_norm=True, use_act=True, act_name=self.act_name, name="conv_3x3",
        )(y, training=training)
        y = ConvLayer2d(
            opts=self.opts, out_channels=self.out_channels, kernel_size=1,
            use_norm=True, use_act=False, name="red_1x1",
        )(y, training=training)
        return x + y if use_res else y


class InvertedResidualSE(nn.Module):
    """Inverted residual with squeeze-excitation and configurable kernel size
    (reference cvnets/modules/mobilenetv2.py:16, used by MobileNetV3/EfficientNet)."""

    opts: Any
    in_channels: int
    out_channels: int
    expand_ratio: float
    use_hs: bool = False  # hard-swish instead of relu
    use_se: bool = False
    stride: int = 1
    kernel_size: int = 3
    dilation: int = 1
    squeeze_factor: int = 4
    stochastic_depth_prob: float = 0.0
    se_scale_fn_name: str = "hard_sigmoid"
    act_fn_name: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        from cvnets_tpu.layers.random_layers import StochasticDepth

        # use_hs forces hard-swish (MobileNetV3); EfficientNet passes
        # act_fn_name="swish" (reference InvertedResidualSE signature)
        act_name = "hard_swish" if self.use_hs else self.act_fn_name
        hidden_dim = make_divisible(round(self.in_channels * self.expand_ratio), 8)
        use_res = self.stride == 1 and self.in_channels == self.out_channels
        y = x
        if self.expand_ratio != 1:
            y = ConvLayer2d(
                opts=self.opts, out_channels=hidden_dim, kernel_size=1,
                use_norm=True, use_act=True, act_name=act_name, name="exp_1x1",
            )(y, training=training)
        y = ConvLayer2d(
            opts=self.opts, out_channels=hidden_dim, kernel_size=self.kernel_size,
            stride=self.stride, dilation=self.dilation, groups=hidden_dim,
            use_norm=True, use_act=True, act_name=act_name, name="conv_kxk",
        )(y, training=training)
        if self.use_se:
            y = SqueezeExcitation(
                opts=self.opts, in_channels=hidden_dim,
                squeeze_factor=self.squeeze_factor,
                scale_fn_name=self.se_scale_fn_name, name="se",
            )(y)
        y = ConvLayer2d(
            opts=self.opts, out_channels=self.out_channels, kernel_size=1,
            use_norm=True, use_act=False, name="red_1x1",
        )(y, training=training)
        if use_res:
            if self.stochastic_depth_prob > 0:
                y = StochasticDepth(p=self.stochastic_depth_prob)(y, training=training)
            y = x + y
        return y
