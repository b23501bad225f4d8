"""Feature Pyramid Network (parity: reference cvnets/modules/feature_pyramid.py:18).

Top-down pathway with 1×1 lateral connections and 3×3 output smoothing; upsampling
is nearest-neighbor resize (static shapes)."""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from cvnets_tpu.layers.conv_layer import ConvLayer2d


class FeaturePyramidNetwork(nn.Module):
    opts: Any
    out_channels: int = 256

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray],
                 training: bool = False) -> List[jnp.ndarray]:
        laterals = [
            ConvLayer2d(opts=self.opts, out_channels=self.out_channels,
                        kernel_size=1, use_norm=True, use_act=False,
                        name=f"lateral_{i}")(fm, training=training)
            for i, fm in enumerate(feature_maps)
        ]
        # top-down accumulation
        for i in range(len(laterals) - 2, -1, -1):
            up = jax.image.resize(
                laterals[i + 1], laterals[i].shape, method="nearest"
            )
            laterals[i] = laterals[i] + up
        return [
            ConvLayer2d(opts=self.opts, out_channels=self.out_channels,
                        kernel_size=3, use_norm=True, use_act=False,
                        name=f"out_{i}")(lat, training=training)
            for i, lat in enumerate(laterals)
        ]
