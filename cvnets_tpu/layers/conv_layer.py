"""Conv + Norm + Act composite layers (parity: reference cvnets/layers/conv_layer.py).

NHWC layout; padding follows the reference convention ``((kernel - 1) // 2) * dilation`` on
each side, which equals SAME for odd kernels and stride-1, and matches torch's
behavior for stride-2 downsampling.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.activation import build_act_layer
from cvnets_tpu.layers.dtype_utils import compute_dtype
from cvnets_tpu.layers.init_utils import conv_init
from cvnets_tpu.layers.normalization import get_normalization_layer


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


class ConvLayer2d(nn.Module):
    """2D convolution optionally followed by normalization and activation.

    Parity: reference cvnets/layers/conv_layer.py (ConvLayer2d) — a fused
    Conv→Norm→Act block with automatic padding. ``groups=in_channels`` gives a
    depthwise conv, which XLA lowers to a TPU-friendly feature-group convolution.
    """

    opts: Any
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    bias: bool = False
    use_norm: bool = True
    use_act: bool = True
    act_name: Optional[str] = None
    norm_name: Optional[str] = None

    def _effective_bias(self) -> bool:
        """Reference quirk (conv_layer.py:166-167): when the norm layer is a
        LayerNorm family member, the conv keeps its bias even if ``bias=False``
        (unlike BN, LN statistics don't absorb a per-channel shift the same
        way). Without this, checkpoints from LN-normalized recipes (CLIP,
        ByteFormer, ViT with model.normalization=layer_norm) have conv biases
        with no flax leaf to land on."""
        if not self.use_norm or self.bias:
            return self.bias
        nt = (self.norm_name
              or getattr(self.opts, "model.normalization.name", "batch_norm")
              or "batch_norm").lower()
        return nt in ("layer_norm", "layer_norm_2d", "layer_norm_fp32")

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        k = _pair(self.kernel_size)
        d = _pair(self.dilation)
        pad = tuple(((kk - 1) // 2 * dd, (kk - 1) // 2 * dd) for kk, dd in zip(k, d))
        use_bias = self._effective_bias()
        from cvnets_tpu.quantization import (
            Int8Conv,
            int8_inference_enabled,
            int8_mode,
        )

        # int8 swap only for dense (groups==1) convs: depthwise convs carry
        # negligible FLOPs/bytes, so quantization overhead outweighs any gain
        if int8_inference_enabled(self.opts) and not training \
                and self.groups == 1:
            # --common.int8-inference: same param tree ("conv/kernel[,bias]"),
            # int8 forward (see cvnets_tpu/quantization for the modes)
            x = Int8Conv(
                mode=int8_mode(self.opts),
                features=self.out_channels,
                kernel_size=k,
                strides=_pair(self.stride),
                padding=pad,
                kernel_dilation=d,
                feature_group_count=self.groups,
                use_bias=use_bias,
                kernel_init=conv_init(self.opts),
                dtype=compute_dtype(self.opts),
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                features=self.out_channels,
                kernel_size=k,
                strides=_pair(self.stride),
                padding=pad,
                kernel_dilation=d,
                feature_group_count=self.groups,
                use_bias=use_bias,
                kernel_init=conv_init(self.opts),
                dtype=compute_dtype(self.opts),
                name="conv",
            )(x)
        if self.use_norm:
            norm = get_normalization_layer(self.opts, norm_type=self.norm_name)
            if norm is not None:
                if isinstance(norm, nn.BatchNorm):
                    x = norm.copy(name="norm")(x, use_running_average=not training)
                else:
                    x = norm.copy(name="norm")(x)
        if self.use_act:
            act = build_act_layer(self.opts, act_name=self.act_name)
            x = act(x)
        return x


class NormActLayer(nn.Module):
    """Norm → Act (no conv); parity: reference conv_layer.py NormActLayer."""

    opts: Any
    norm_name: Optional[str] = None
    act_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        norm = get_normalization_layer(self.opts, norm_type=self.norm_name)
        if norm is not None:
            if isinstance(norm, nn.BatchNorm):
                x = norm.copy(name="norm")(x, use_running_average=not training)
            else:
                x = norm.copy(name="norm")(x)
        return build_act_layer(self.opts, act_name=self.act_name)(x)


class SeparableConv2d(nn.Module):
    """Depthwise k×k + pointwise 1×1 (parity: reference SeparableConv2d)."""

    opts: Any
    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    dilation: Union[int, Tuple[int, int]] = 1
    use_norm: bool = True
    use_act: bool = True
    bias: bool = False
    act_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]  # infer; declared in_channels is informational
        x = ConvLayer2d(
            opts=self.opts,
            out_channels=in_ch,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            groups=in_ch,
            bias=False,
            use_norm=True,
            use_act=False,
            name="dw_conv",
        )(x, training=training)
        x = ConvLayer2d(
            opts=self.opts,
            out_channels=self.out_channels,
            kernel_size=1,
            bias=self.bias,
            use_norm=self.use_norm,
            use_act=self.use_act,
            act_name=self.act_name,
            name="pw_conv",
        )(x, training=training)
        return x


class BlockConvTranspose(nn.Module):
    """Transposed conv with ``kernel == stride`` (non-overlapping output
    blocks), computed as one einsum + depth-to-space instead of an
    lhs-dilated convolution: ``out[·, s·i+di, s·j+dj, o] = Σ_c x[·,i,j,c] ·
    K[di,dj,c,o]``. Numerically identical to ``nn.ConvTranspose`` with SAME
    padding (same param tree: ``kernel`` (kh,kw,in,out), ``bias`` (out,)) but
    both forward and backward are plain matmuls — MXU work on TPU, and no
    rhs-dilated gradient conv, which XLA-CPU executes with a naive
    quadratic loop (measured 33.6 s of a 42 s Mask R-CNN CI step)."""

    features: int
    kernel_size: Tuple[int, int] = (2, 2)
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        b, h, w, cin = x.shape
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, cin, self.features))
        # flax/lax conv_transpose places kernel taps flipped within each
        # output block: out[s·i+d] = x[i] · K[k-1-d]
        kernel = kernel[::-1, ::-1]
        y = jnp.einsum("bhwc,ijco->bhiwjo", x.astype(self.dtype),
                       kernel.astype(self.dtype))
        y = y.reshape(b, h * kh, w * kw, self.features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class TransposeConvLayer2d(nn.Module):
    """Transposed conv (+norm+act); parity: reference TransposeConvLayer2d."""

    opts: Any
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 2
    stride: Union[int, Tuple[int, int]] = 2
    bias: bool = False
    use_norm: bool = True
    use_act: bool = True
    act_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        if _pair(self.kernel_size) == _pair(self.stride):
            x = BlockConvTranspose(
                features=self.out_channels,
                kernel_size=_pair(self.kernel_size),
                use_bias=self.bias,
                kernel_init=conv_init(self.opts),
                dtype=compute_dtype(self.opts),
                name="conv",
            )(x)
        else:
            x = nn.ConvTranspose(
                features=self.out_channels,
                kernel_size=_pair(self.kernel_size),
                strides=_pair(self.stride),
                padding="SAME",
                use_bias=self.bias,
                kernel_init=conv_init(self.opts),
                dtype=compute_dtype(self.opts),
                name="conv",
            )(x)
        if self.use_norm:
            norm = get_normalization_layer(self.opts)
            if norm is not None:
                if isinstance(norm, nn.BatchNorm):
                    x = norm.copy(name="norm")(x, use_running_average=not training)
                else:
                    x = norm.copy(name="norm")(x)
        if self.use_act:
            x = build_act_layer(self.opts, act_name=self.act_name)(x)
        return x
