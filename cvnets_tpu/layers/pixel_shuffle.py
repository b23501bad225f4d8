"""PixelShuffle for NHWC (parity: reference cvnets/layers/pixel_shuffle.py —
torch PixelShuffle semantics, used by the reference's CoreML fold fallback and
upsampling heads)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, upscale_factor: int) -> jnp.ndarray:
    """(B, H, W, C·r²) -> (B, H·r, W·r, C), matching torch's channel ordering."""
    b, h, w, c = x.shape
    r = upscale_factor
    oc = c // (r * r)
    x = x.reshape(b, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r, W, r, C
    return x.reshape(b, h * r, w * r, oc)


def pixel_unshuffle(x: jnp.ndarray, downscale_factor: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    r = downscale_factor
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


class PixelShuffle(nn.Module):
    upscale_factor: int = 2

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return pixel_shuffle(x, self.upscale_factor)
