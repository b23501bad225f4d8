"""Text transformer encoder for CLIP (parity: reference
cvnets/text_encoders/transformer.py:26-530): token embedding, learnable
positional embedding, pre-norm transformer stack with causal masking, final LN,
features at the EOT token (highest token id), linear projection.

Zero-shot multi-caption forward (reference :428-530) folds the (classes, captions)
axes into the batch and mean-pools caption embeddings per class."""

from __future__ import annotations

import argparse
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cvnets_tpu.layers.dtype_utils import compute_dtype
from cvnets_tpu.layers.positional_embedding import PositionalEmbedding
from cvnets_tpu.models.multi_modal.text_encoders import TEXT_ENCODER_REGISTRY
from cvnets_tpu.modules.transformer import TransformerEncoder


class BaseTextEncoder(nn.Module):
    opts: Any = None
    projection_dim: int = 256

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        return parser


TEXT_ENCODER_REGISTRY.register(name="__base__")(BaseTextEncoder)


@TEXT_ENCODER_REGISTRY.register(name="transformer")
class TextTransformer(BaseTextEncoder):
    opts: Any = None
    projection_dim: int = 256

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.text.context-length", type=int, default=77)
        group.add_argument("--model.text.vocab-size", type=int, default=49408)
        group.add_argument("--model.text.transformer.model-dim", type=int, default=512)
        group.add_argument("--model.text.transformer.no-scale-embedding",
                           action="store_true")
        group.add_argument("--model.text.transformer.no-pos-embedding",
                           action="store_true")
        group.add_argument("--model.text.transformer.embed-dropout", type=float,
                           default=0.0)
        group.add_argument("--model.text.transformer.n-transformer-layers",
                           type=int, default=12)
        group.add_argument("--model.text.transformer.n-heads-per-layer", type=int,
                           nargs="+", default=[8])
        group.add_argument("--model.text.transformer.ffn-multiplier-per-layer",
                           type=float, nargs="+", default=[4.0])
        group.add_argument("--model.text.transformer.attn-dropout", type=float,
                           default=0.0)
        group.add_argument("--model.text.transformer.ffn-dropout", type=float,
                           default=0.0)
        group.add_argument("--model.text.transformer.dropout", type=float,
                           default=0.0)
        group.add_argument("--model.text.transformer.norm-layer", type=str,
                           default="layer_norm")
        group.add_argument("--model.text.transformer.sinusoidal-pos-emb",
                           action="store_true")
        group.add_argument("--model.text.transformer.gradient-checkpoint",
                           action="store_true")
        group.add_argument("--model.text.transformer.num-checkpoint-segments",
                           type=int, default=1)
        group.add_argument("--model.text.transformer.causal-masking",
                           action="store_true", default=False)
        group.add_argument("--model.text.transformer.classes-per-split-zero-shot",
                           type=int, default=20)
        return parser

    @nn.compact
    def __call__(self, text: jnp.ndarray, key_padding_mask=None,
                 training: bool = False) -> jnp.ndarray:
        """text: (B, L) int token ids (or (B, n_captions, L) for zero-shot; caption
        axis folded into batch and mean-pooled after encoding)."""
        opts = self.opts
        fold_captions = text.ndim == 3
        if fold_captions:
            b, n_cap, seq = text.shape
            text = text.reshape(b * n_cap, seq)

        model_dim = getattr(opts, "model.text.transformer.model_dim", 512)
        vocab_size = getattr(opts, "model.text.vocab_size", 49408)
        context_len = getattr(opts, "model.text.context_length", 77)
        n_layers = getattr(opts, "model.text.transformer.n_transformer_layers", 12)
        heads = getattr(opts, "model.text.transformer.n_heads_per_layer", [8])
        if isinstance(heads, int):
            heads = [heads]
        heads = (heads * n_layers)[:n_layers]
        ffn_mults = getattr(opts,
                            "model.text.transformer.ffn_multiplier_per_layer", [4.0])
        if isinstance(ffn_mults, (int, float)):
            ffn_mults = [ffn_mults]
        ffn_mults = (list(ffn_mults) * n_layers)[:n_layers]
        causal = getattr(opts, "model.text.transformer.causal_masking", False)
        no_scale = getattr(opts, "model.text.transformer.no_scale_embedding", False)
        no_pos = getattr(opts, "model.text.transformer.no_pos_embedding", False)

        table = self.param(
            "token_embedding", nn.initializers.normal(stddev=model_dim**-0.5),
            (vocab_size, model_dim),
        )
        x = jnp.take(table, text, axis=0)
        # torch nn.Embedding(padding_idx=...) semantics (reference
        # text_encoders/transformer.py:55,81): the pad token contributes a
        # zero vector and receives no gradient
        pad_idx = getattr(opts, "dataset.padding_index", None)
        if pad_idx is not None:
            x = jnp.where((text == pad_idx)[..., None], 0.0, x)
        # NOTE: the reference computes embed_scale but its application is
        # commented out (reference transformer.py:334) — embeddings are NOT
        # scaled, regardless of --model.text.transformer.no-scale-embedding.
        # Mirror that for checkpoint/logit parity (test_parity_clip_mobilenetv2).
        del no_scale
        if not no_pos:
            x = PositionalEmbedding(
                num_embeddings=context_len, embedding_dim=model_dim,
                is_learnable=not getattr(
                    opts, "model.text.transformer.sinusoidal_pos_emb", False),
                name="pos_embed",
            )(x)
        embed_dropout = getattr(opts, "model.text.transformer.embed_dropout", 0.0)
        if embed_dropout > 0:
            x = nn.Dropout(rate=embed_dropout, deterministic=not training)(x)

        attn_mask = None
        if causal:
            seq = x.shape[1]
            causal_mask = jnp.triu(
                jnp.full((seq, seq), jnp.finfo(jnp.float32).min), k=1
            )
            attn_mask = causal_mask[None, None]

        block_cls = TransformerEncoder
        if getattr(opts, "model.text.transformer.gradient_checkpoint", False):
            # reference transformer.py uses checkpoint_sequential with
            # num_checkpoint_segments; per-block remat is math-identical with
            # at-most-lower peak memory
            block_cls = nn.remat(TransformerEncoder, static_argnums=(5,))
        for i in range(n_layers):
            x = block_cls(
                opts=opts, embed_dim=model_dim,
                ffn_latent_dim=int(ffn_mults[i] * model_dim), num_heads=heads[i],
                attn_dropout=getattr(opts, "model.text.transformer.attn_dropout", 0.0),
                dropout=getattr(opts, "model.text.transformer.dropout", 0.0),
                ffn_dropout=getattr(opts, "model.text.transformer.ffn_dropout", 0.0),
                transformer_norm_layer=getattr(
                    opts, "model.text.transformer.norm_layer", "layer_norm"),
                name=f"transformer_{i}",
            )(x, None, key_padding_mask, attn_mask, training)
        x = nn.LayerNorm(epsilon=1e-5, name="final_norm")(x)

        # features at EOT token = highest token id per sequence (CLIP convention)
        eot = jnp.argmax(text, axis=-1)
        feats = jnp.take_along_axis(x, eot[:, None, None], axis=1).squeeze(1)
        proj = self.param(
            "projection", nn.initializers.normal(stddev=model_dim**-0.5),
            (model_dim, self.projection_dim),
        )
        feats = feats @ proj.astype(feats.dtype)
        if fold_captions:
            feats = feats.reshape(b, n_cap, -1).mean(axis=1)
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats
