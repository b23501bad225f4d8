"""Int8 post-training quantization for TPU inference.

No reference analog (the reference deploys via CoreML conversion,
``main_conversion.py:19`` + ``utils/pytorch_to_coreml.py:20``, and leaves
quantization to coremltools). On TPU the MXU executes s8×s8→s32 matmuls and
convolutions at twice the bf16 rate (v5e: ~394 TOPS int8 vs ~197 TFLOPs
bf16), so an int8 path is the TPU-native deployment story.

Scheme: **dynamic-range symmetric int8**
  * weights — per-output-channel absmax scales, quantized at trace time from
    the float checkpoint (no calibration pass, no separate checkpoint format:
    the param tree is byte-identical to the float model's, so any trained or
    converted checkpoint loads unchanged);
  * activations — per-tensor dynamic absmax computed on device each call
    (one cheap VPU reduction per matmul, amortized against the 2× MXU rate);
  * accumulation in int32 via ``preferred_element_type``, dequantized by
    ``scale_x · scale_w[o]`` and cast back to the layer compute dtype.

Enabled with ``--common.int8-inference`` (inference only; the training path
is untouched). ``Int8Conv`` / ``Int8Dense`` mirror ``nn.Conv`` / ``nn.Dense``
parameter trees ("kernel"/"bias", same shapes) so they are drop-in swaps
inside ``ConvLayer2d`` / ``LinearLayer``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


def int8_inference_enabled(opts: Any) -> bool:
    return bool(getattr(opts, "common.int8_inference", False))


def quantize_symmetric(
    w: jnp.ndarray, axes: Sequence[int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization of ``w`` with absmax scales reduced over
    ``axes`` (the non-channel axes). Returns ``(q, scale)`` with
    ``w ≈ q.astype(f32) * scale``; zero slices get scale eps (q == 0)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=tuple(axes),
                     keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _quantize_activation(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor dynamic symmetric quantization of an activation."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


class Int8Conv(nn.Module):
    """Drop-in ``nn.Conv`` with a dynamic-int8 forward.

    Parameter tree matches ``nn.Conv`` exactly: ``kernel`` stays the float
    master copy (kh, kw, cin/groups, cout) — quantization happens in-graph,
    and XLA constant-folds the weight quantization when params are donated
    or closed over for serving."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Tuple[Tuple[int, int], ...]] = "SAME"
    kernel_dilation: Tuple[int, int] = (1, 1)
    feature_group_count: int = 1
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1] // self.feature_group_count
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, cin, self.features))
        out_dtype = self.dtype or x.dtype
        qw, w_scale = quantize_symmetric(kernel, axes=(0, 1, 2))
        qx, x_scale = _quantize_activation(x)
        out = lax.conv_general_dilated(
            qx, qw,
            window_strides=self.strides,
            padding=self.padding,
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
            preferred_element_type=jnp.int32,
        )
        # w_scale is (1,1,1,cout) -> broadcast over NHW
        out = out.astype(jnp.float32) * (x_scale * w_scale.reshape(1, 1, 1, -1))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,))
            out = out + bias.astype(jnp.float32)
        return out.astype(out_dtype)


class Int8Dense(nn.Module):
    """Drop-in ``nn.Dense`` with a dynamic-int8 forward (params: ``kernel``
    (in, out) float master + optional ``bias``)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        out_dtype = self.dtype or x.dtype
        qw, w_scale = quantize_symmetric(kernel, axes=(0,))
        qx, x_scale = _quantize_activation(x)
        out = lax.dot_general(
            qx, qw, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = out.astype(jnp.float32) * (x_scale * w_scale.reshape(-1))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,))
            out = out + bias.astype(jnp.float32)
        return out.astype(out_dtype)
