"""Positional embeddings with sequence-length interpolation.

Parity: reference cvnets/layers/positional_embedding.py:16-115 — learnable or
sinusoidal embeddings, resized by linear interpolation when the runtime sequence
length differs from the trained one (used by ViT for variable resolutions).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _sinusoidal_table(num_embeddings: int, dim: int) -> jnp.ndarray:
    position = jnp.arange(num_embeddings, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim)
    )
    table = jnp.zeros((num_embeddings, dim), dtype=jnp.float32)
    table = table.at[:, 0::2].set(jnp.sin(position * div))
    table = table.at[:, 1::2].set(jnp.cos(position * div[: (dim + 1) // 2]))
    return table


def interpolate_pos_embed(pos: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Linearly resample a (L, D) table to (target_len, D) (static shapes only).

    Matches torch ``F.interpolate(mode="bilinear", align_corners=False)`` exactly:
    half-pixel coordinate mapping and NO anti-aliasing on downscale
    (``jax.image.resize`` anti-aliases when shrinking, which diverges from the
    reference checkpoints' semantics — reference positional_embedding.py:90-95).
    """
    src_len = pos.shape[0]
    if src_len == target_len:
        return pos
    scale = src_len / target_len
    coords = (jnp.arange(target_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    coords = jnp.clip(coords, 0.0, src_len - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, src_len - 1)
    w = (coords - lo.astype(jnp.float32))[:, None]
    return pos[lo] * (1.0 - w) + pos[hi] * w


class PositionalEmbedding(nn.Module):
    """Additive positional embedding over (B, L, D) token tensors."""

    num_embeddings: int
    embedding_dim: int
    is_learnable: bool = True
    interpolation_mode: str = "bilinear"
    std: float = 0.02
    # "interpolate": resample the table to the sequence length (ViT semantics);
    # "slice": take the first seq_len rows (ByteFormer — the reference asks the
    # table for max_num_tokens and slices, byteformer.py:353)
    resize_mode: str = "interpolate"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        seq_len = x.shape[1]
        if self.is_learnable:
            table = self.param(
                "pos_embed",
                nn.initializers.truncated_normal(stddev=self.std),
                (self.num_embeddings, self.embedding_dim),
            )
        else:
            table = _sinusoidal_table(self.num_embeddings, self.embedding_dim)
        if self.resize_mode == "slice" and seq_len <= self.num_embeddings:
            table = table[:seq_len]
        else:
            table = interpolate_pos_embed(table, seq_len)
        return x + table[None, :, :].astype(x.dtype)
