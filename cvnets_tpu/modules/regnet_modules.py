"""RegNet blocks (parity: reference cvnets/modules/regnet_modules.py:16-254;
arXiv:2003.13678)."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.activation import build_act_layer
from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.layers.random_layers import StochasticDepth
from cvnets_tpu.modules.squeeze_excitation import SqueezeExcitation


class XRegNetBlock(nn.Module):
    """X block: 1×1 → grouped 3×3 (stride) → [SE] → 1×1, residual add."""

    opts: Any
    in_channels: int
    out_channels: int
    stride: int = 1
    group_width: int = 1
    bottleneck_multiplier: float = 1.0
    se_ratio: float = 0.0
    stochastic_depth_prob: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        bottleneck = int(round(self.out_channels * self.bottleneck_multiplier))
        n_groups = max(1, bottleneck // max(1, self.group_width))
        y = ConvLayer2d(opts=self.opts, out_channels=bottleneck, kernel_size=1,
                        use_norm=True, use_act=True, name="conv1")(x, training=training)
        y = ConvLayer2d(opts=self.opts, out_channels=bottleneck, kernel_size=3,
                        stride=self.stride, groups=n_groups, use_norm=True,
                        use_act=True, name="conv2")(y, training=training)
        if self.se_ratio > 0:
            # SE width relative to the block INPUT (torchvision/reference behavior)
            # reference regnet_modules.py:73: int(round(se_ratio * width_in))
            squeeze = int(round(self.se_ratio * self.in_channels))
            y = SqueezeExcitation(opts=self.opts, in_channels=bottleneck,
                                  squeeze_channels=max(1, squeeze),
                                  scale_fn_name="sigmoid", name="se")(y)
        # the final 1x1 keeps its activation (reference regnet_modules.py:80-88:
        # conv_1x1_2 has use_act=True, unlike a classic pre-residual bottleneck)
        y = ConvLayer2d(opts=self.opts, out_channels=self.out_channels, kernel_size=1,
                        use_norm=True, use_act=True, name="conv3")(y,
                                                                   training=training)
        if self.stride != 1 or self.in_channels != self.out_channels:
            x = ConvLayer2d(opts=self.opts, out_channels=self.out_channels,
                            kernel_size=1, stride=self.stride, use_norm=True,
                            use_act=False, name="down")(x, training=training)
        if self.stochastic_depth_prob > 0:
            y = StochasticDepth(p=self.stochastic_depth_prob)(y, training=training)
        return build_act_layer(self.opts)(x + y)
