"""Token merging downsampler used by ByteFormer.

Parity: reference cvnets/layers/token_merging.py:16 — merges each window of
``window_size`` consecutive tokens into one via LayerNorm + Linear on the
concatenated window. Static-shape friendly: pads the sequence up to a multiple of
the window before merging.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class TokenMerging(nn.Module):
    opts: Any
    dim: int
    window: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        pad = (-n) % self.window
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            n = n + pad
        # reference token_merging.py:60-63: unfold is CHANNEL-major
        # ([B, N//w, C, w] -> C*w), then reduction (no bias), then LayerNorm
        x = x.reshape(b, n // self.window, self.window, c)
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, n // self.window,
                                                   c * self.window)
        x = nn.Dense(self.dim, use_bias=False, name="reduction")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return x
