"""Transformer encoder blocks (parity: reference cvnets/modules/transformer.py:26-264).

``TransformerEncoder``: pre-norm MHA + FFN (ViT/MobileViTv1/text encoder).
``LinearAttnFFN``: pre-norm separable linear attention + conv-FFN (MobileViTv2),
operating on (B, P, N, C) patch tensors; the 1×1 convs are Dense on the trailing axis.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.activation import build_act_layer
from cvnets_tpu.layers.dtype_utils import compute_dtype
from cvnets_tpu.layers.init_utils import linear_init
from cvnets_tpu.layers.linear_attention import LinearSelfAttention
from cvnets_tpu.layers.multi_head_attention import MultiHeadAttention
from cvnets_tpu.layers.normalization import get_normalization_layer


def _norm(opts, norm_layer: Optional[str], name: str, eps: float = 1e-5):
    norm = get_normalization_layer(opts, norm_type=norm_layer, eps=eps)
    if norm is None:
        return lambda x: x
    return norm.copy(name=name)


class TransformerEncoder(nn.Module):
    """Pre-norm MHA + FFN block (reference transformer.py:26)."""

    opts: Any
    embed_dim: int
    ffn_latent_dim: int
    num_heads: int = 8
    attn_dropout: float = 0.0
    dropout: float = 0.0
    ffn_dropout: float = 0.0
    transformer_norm_layer: str = "layer_norm"
    act_name: Optional[str] = None
    stochastic_dropout: float = 0.0
    # reference ViT forces 1e-6 on every LayerNorm (vit.py:204-208); default
    # elsewhere is the torch LayerNorm default 1e-5
    norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_prev: Optional[jnp.ndarray] = None,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 attn_mask: Optional[jnp.ndarray] = None,
                 training: bool = False) -> jnp.ndarray:
        from cvnets_tpu.layers.random_layers import StochasticDepth

        dt = compute_dtype(self.opts)
        # attention
        y = _norm(self.opts, self.transformer_norm_layer, "pre_norm_mha", self.norm_eps)(x)
        y = MultiHeadAttention(
            opts=self.opts, embed_dim=self.embed_dim, num_heads=self.num_heads,
            attn_dropout=self.attn_dropout, name="mha",
        )(y, x_kv=x_prev, key_padding_mask=key_padding_mask, attn_mask=attn_mask,
          training=training)
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)
        if self.stochastic_dropout > 0:
            y = StochasticDepth(p=self.stochastic_dropout)(y, training=training)
        x = x + y
        # ffn
        from cvnets_tpu.quantization import quant_dense

        y = _norm(self.opts, self.transformer_norm_layer, "pre_norm_ffn", self.norm_eps)(x)
        y = quant_dense(self.opts, training, self.ffn_latent_dim,
                        kernel_init=linear_init(self.opts),
                        dtype=dt, name="ffn_fc1")(y)
        act = build_act_layer(self.opts, act_name=self.act_name)
        y = act(y)
        if self.ffn_dropout > 0:
            y = nn.Dropout(rate=self.ffn_dropout, deterministic=not training)(y)
        y = quant_dense(self.opts, training, self.embed_dim,
                        kernel_init=linear_init(self.opts),
                        dtype=dt, name="ffn_fc2")(y)
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)
        if self.stochastic_dropout > 0:
            y = StochasticDepth(p=self.stochastic_dropout)(y, training=training)
        return x + y


class LinearAttnFFN(nn.Module):
    """Pre-norm separable attention + FFN on (B, P, N, C) patches
    (reference transformer.py:159)."""

    opts: Any
    embed_dim: int
    ffn_latent_dim: int
    attn_dropout: float = 0.0
    dropout: float = 0.0
    ffn_dropout: float = 0.0
    norm_layer: str = "layer_norm_2d"

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_prev: Optional[jnp.ndarray] = None,
                 training: bool = False) -> jnp.ndarray:
        dt = compute_dtype(self.opts)
        y = _norm(self.opts, self.norm_layer, "pre_norm_attn")(x)
        y = LinearSelfAttention(
            opts=self.opts, embed_dim=self.embed_dim,
            attn_dropout=self.attn_dropout, name="attn",
        )(y, x_prev=x_prev, training=training)
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)
        x = x + y

        from cvnets_tpu.quantization import quant_dense

        y = _norm(self.opts, self.norm_layer, "pre_norm_ffn")(x)
        y = quant_dense(self.opts, training, self.ffn_latent_dim, use_bias=True,
                        kernel_init=linear_init(self.opts), dtype=dt,
                        name="ffn_fc1")(y)
        y = build_act_layer(self.opts)(y)
        if self.ffn_dropout > 0:
            y = nn.Dropout(rate=self.ffn_dropout, deterministic=not training)(y)
        y = quant_dense(self.opts, training, self.embed_dim, use_bias=True,
                        kernel_init=linear_init(self.opts), dtype=dt,
                        name="ffn_fc2")(y)
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)
        return x + y
