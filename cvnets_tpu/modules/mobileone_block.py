"""MobileOne / RepLK blocks with train-time branch over-parameterization.

Parity: reference cvnets/modules/mobileone_block.py:17-455. At train time the block
sums ``num_conv_branches`` k×k convs + a 1×1 scale branch + a BN identity branch; at
inference the branches re-parameterize into one conv (``get_exportable_model`` — the
host-side weight merge lives in cvnets_tpu/utils/reparam_utils.py).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.activation import build_act_layer
from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.modules.squeeze_excitation import SqueezeExcitation


class MobileOneBlock(nn.Module):
    opts: Any
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    use_se: bool = False
    use_act: bool = True
    use_scale_branch: bool = True
    num_conv_branches: int = 1
    inference_mode: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        if self.inference_mode:
            y = ConvLayer2d(opts=self.opts, out_channels=self.out_channels,
                            kernel_size=self.kernel_size, stride=self.stride,
                            groups=self.groups, bias=True, use_norm=False,
                            use_act=False, name="reparam_conv")(x, training=training)
        else:
            y = 0.0
            # identity BN branch
            if self.in_channels == self.out_channels and self.stride == 1:
                bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                  use_running_average=not training, name="skip_bn")
                y = y + bn(x)
            # k×k conv branches
            for i in range(self.num_conv_branches):
                y = y + ConvLayer2d(
                    opts=self.opts, out_channels=self.out_channels,
                    kernel_size=self.kernel_size, stride=self.stride,
                    groups=self.groups, use_norm=True, use_act=False,
                    name=f"conv_branch_{i}",
                )(x, training=training)
            # 1×1 scale branch
            if self.kernel_size > 1 and self.use_scale_branch:
                y = y + ConvLayer2d(
                    opts=self.opts, out_channels=self.out_channels, kernel_size=1,
                    stride=self.stride, groups=self.groups, use_norm=True,
                    use_act=False, name="scale_branch",
                )(x, training=training)
        if self.use_se:
            y = SqueezeExcitation(opts=self.opts, in_channels=self.out_channels,
                                  squeeze_factor=16, scale_fn_name="sigmoid",
                                  name="se")(y)
        if self.use_act:
            y = build_act_layer(self.opts)(y)
        return y


class RepLKBlock(nn.Module):
    """Large-kernel grouped reparam block (reference mobileone_block.py:304,
    used by FastViT): grouped k×k BN + parallel small-kernel BN, summed, then
    the model activation. Supports channel expansion via grouped convs
    (FastViT downsamplers use in->2*in with groups=in)."""

    opts: Any
    channels: int  # input channels (kept for call-site compat)
    out_channels: Optional[int] = None  # default: channels
    kernel_size: int = 7
    small_kernel: Optional[int] = 3
    stride: int = 1
    groups: Optional[int] = None  # default: depthwise (= channels)
    # The reference RepLK forward computes `self.activation(out)` and DISCARDS
    # the result (mobileone_block.py:408) — with the default non-inplace
    # activation it is a no-op, and published FastViT checkpoints were trained
    # that way. Parity requires NOT activating here.
    use_act: bool = False
    inference_mode: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        out_ch = self.out_channels or self.channels
        groups = self.groups or self.channels
        act = (build_act_layer(self.opts) if self.use_act else (lambda v: v))
        if self.inference_mode:
            return act(ConvLayer2d(opts=self.opts, out_channels=out_ch,
                                   kernel_size=self.kernel_size, stride=self.stride,
                                   groups=groups, bias=True, use_norm=False,
                                   use_act=False, name="reparam_conv")(
                                       x, training=training))
        y = ConvLayer2d(opts=self.opts, out_channels=out_ch,
                        kernel_size=self.kernel_size, stride=self.stride,
                        groups=groups, use_norm=True, use_act=False,
                        name="lk_conv")(x, training=training)
        if self.small_kernel is not None:
            y = y + ConvLayer2d(opts=self.opts, out_channels=out_ch,
                                kernel_size=self.small_kernel, stride=self.stride,
                                groups=groups, use_norm=True, use_act=False,
                                name="sk_conv")(x, training=training)
        return act(y)
