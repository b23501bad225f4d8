"""SSD prediction heads (parity: reference cvnets/modules/ssd_heads.py:17-240).

SSDHead: optional 1×1 projection, then a separable k×k conv producing
``n_anchors * (4 + n_classes)`` channels, split into loc/cls. SSDInstanceHead
produces mask coefficients for the instance variant.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.conv_layer import ConvLayer2d, SeparableConv2d


class SSDHead(nn.Module):
    opts: Any
    n_classes: int
    n_anchors: int
    proj_channels: int = -1
    kernel_size: int = 3
    stride: int = 1
    in_channels: int = -1  # informational; flax infers

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        in_ch = x.shape[-1]
        if self.proj_channels > 0 and self.proj_channels != in_ch \
                and self.kernel_size > 1:
            x = ConvLayer2d(opts=self.opts, out_channels=self.proj_channels,
                            kernel_size=1, use_norm=True, use_act=True,
                            name="proj_layer")(x, training=training)
            in_ch = self.proj_channels

        out_ch = self.n_anchors * (4 + self.n_classes)
        if self.kernel_size > 1:
            y = SeparableConv2d(
                opts=self.opts, in_channels=in_ch, out_channels=out_ch,
                kernel_size=self.kernel_size, stride=1, use_norm=False,
                use_act=False, bias=True, name="loc_cls_layer",
            )(x, training=training)
        else:
            y = ConvLayer2d(opts=self.opts, out_channels=out_ch, kernel_size=1,
                            use_norm=False, use_act=False, bias=True,
                            name="loc_cls_layer")(x, training=training)

        b = y.shape[0]
        y = y.reshape(b, -1, 4 + self.n_classes)  # (B, H*W*A, 4+C)
        boxes = y[..., :4]
        scores = y[..., 4:]
        return boxes, scores


class SSDInstanceHead(nn.Module):
    """Mask-coefficient head for instance segmentation variants
    (reference ssd_heads.py:159)."""

    opts: Any
    out_channels: int
    inner_channels: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        x = ConvLayer2d(opts=self.opts, out_channels=self.inner_channels,
                        kernel_size=3, use_norm=True, use_act=True,
                        name="conv1")(x, training=training)
        return ConvLayer2d(opts=self.opts, out_channels=self.out_channels,
                           kernel_size=1, use_norm=False, use_act=False, bias=True,
                           name="proj")(x, training=training)
