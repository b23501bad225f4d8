"""Pooling layers (parity: reference cvnets/layers/global_pool.py, pooling.py)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class GlobalPool(nn.Module):
    """Global spatial pooling over NHWC (or N,N_tokens,C) inputs.

    pool_type: "mean" | "rms" | "abs" (parity: reference cvnets/layers/global_pool.py:83).
    """

    pool_type: str = "mean"
    keep_dim: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 4:
            axes = (1, 2)
        elif x.ndim == 3:
            axes = (1,)
        elif x.ndim == 5:
            axes = (1, 2, 3)
        else:
            raise ValueError(f"GlobalPool expects 3/4/5D input; got {x.ndim}D")
        if self.pool_type == "rms":
            y = jnp.sqrt(jnp.mean(x**2, axis=axes, keepdims=self.keep_dim))
        elif self.pool_type == "abs":
            y = jnp.mean(jnp.abs(x), axis=axes, keepdims=self.keep_dim)
        else:
            y = jnp.mean(x, axis=axes, keepdims=self.keep_dim)
        return y


class MaxPool2d(nn.Module):
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.padding
        return nn.max_pool(
            x,
            window_shape=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
        )


class AvgPool2d(nn.Module):
    kernel_size: int = 2
    stride: int = 2
    padding: int = 0

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.padding
        return nn.avg_pool(
            x,
            window_shape=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
        )


def adaptive_avg_pool_2d(x: jnp.ndarray, output_size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC adaptive average pool to a fixed (oh, ow) grid.

    Used by PSP/ASPP heads (reference cvnets/modules/pspnet_module.py,
    aspp_block.py). Requires input dims divisible-friendly shapes to stay static
    under jit; implemented with reshape-mean when divisible, else strided windows.
    """
    n, h, w, c = x.shape
    oh, ow = output_size
    if h % oh == 0 and w % ow == 0:
        return x.reshape(n, oh, h // oh, ow, w // ow, c).mean(axis=(2, 4))
    kh, kw = -(-h // oh), -(-w // ow)
    sh, sw = max(1, h // oh), max(1, w // ow)
    y = nn.avg_pool(x, window_shape=(kh, kw), strides=(sh, sw), padding="VALID")
    return y[:, :oh, :ow, :]
