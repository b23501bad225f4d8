"""Image projection heads for CLIP-style models (parity: reference
cvnets/image_projection_layers/*:450LoC)."""

from __future__ import annotations

import argparse
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.models.multi_modal.image_projection import (
    IMAGE_PROJECTION_HEAD_REGISTRY,
)


@IMAGE_PROJECTION_HEAD_REGISTRY.register(name="simple_projection_nc2nc")
class SimpleImageProjectionHead(nn.Module):
    """Single learnable projection matrix with L2-normalized output
    (reference SimpleImageProjectionHead:21)."""

    opts: Any = None
    in_dim: int = 512
    out_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        in_dim = x.shape[-1]
        proj = self.param(
            "proj", nn.initializers.normal(stddev=in_dim**-0.5),
            (in_dim, self.out_dim),
        )
        x = x @ proj.astype(x.dtype)
        return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                   keepdims=True).astype(x.dtype)


@IMAGE_PROJECTION_HEAD_REGISTRY.register(name="global_pool_nchw2nc")
class GlobalPool2D(nn.Module):
    """Global pool + projection (reference GlobalPool2D:22)."""

    opts: Any = None
    in_dim: int = 512
    out_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        if x.ndim == 4:
            x = jnp.mean(x, axis=(1, 2))
        in_dim = x.shape[-1]
        proj = self.param(
            "proj", nn.initializers.normal(stddev=in_dim**-0.5),
            (in_dim, self.out_dim),
        )
        x = x @ proj.astype(x.dtype)
        return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                   keepdims=True).astype(x.dtype)


@IMAGE_PROJECTION_HEAD_REGISTRY.register(name="attention_pool_nchw2nc")
class AttentionPool2dHead(nn.Module):
    """CLIP-ResNet attention pooling (reference AttentionPool2dHead:21):
    mean token as query over spatial tokens + positional embedding."""

    opts: Any = None
    in_dim: int = 512
    out_dim: int = 256
    num_heads: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        from cvnets_tpu.layers.multi_head_attention import MultiHeadAttention

        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean_tok = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(stddev=c**-0.5),
            (h * w + 1, c),
        )
        tokens = tokens + pos[None].astype(tokens.dtype)
        attn_out = MultiHeadAttention(
            opts=self.opts, embed_dim=c, num_heads=self.num_heads, name="attn",
        )(tokens[:, :1], x_kv=tokens, training=training)
        x = attn_out[:, 0]
        proj = self.param(
            "proj", nn.initializers.normal(stddev=c**-0.5),
            (c, self.out_dim),
        )
        x = x @ proj.astype(x.dtype)
        return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                   keepdims=True).astype(x.dtype)
