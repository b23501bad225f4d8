"""ByteFormer: classification directly on file bytes (parity: reference
cvnets/models/classification/byteformer.py:49-449 + audio_byteformer.py:19;
arXiv:2306.00238).

Byte embedding (vocab 257 incl. mask token) → strided 1D conv token reduction →
pos-embed → windowed-transformer stack with shifts and TokenMerging downsamplers →
final norm → masked mean pool → linear classifier. Padding is label -1 at the input,
carried as a key-padding mask through windows and downsamplers (all static shapes)."""

from __future__ import annotations

import argparse
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cvnets_tpu.constants import if_test_env
from cvnets_tpu.layers.dtype_utils import compute_dtype
from cvnets_tpu.layers.init_utils import linear_init
from cvnets_tpu.layers.positional_embedding import PositionalEmbedding
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.base_model import BaseAnyNNModel
from cvnets_tpu.models.classification.config.vit import _MODES as _VIT_MODES
from cvnets_tpu.modules.windowed_transformer import WindowedTransformerEncoder


def get_configuration(opts) -> Dict:
    mode = (getattr(opts, "model.classification.byteformer.mode", "tiny")
            or "tiny").lower()
    dropout = getattr(opts, "model.classification.byteformer.dropout", 0.0)
    norm_layer = getattr(opts, "model.classification.byteformer.norm_layer",
                         "layer_norm")
    embed_dim, n_layers, n_heads, pos_drop = _VIT_MODES.get(mode, _VIT_MODES["tiny"])
    return {
        "embed_dim": embed_dim, "n_transformer_layers": n_layers,
        "n_attn_heads": n_heads, "ffn_dim": embed_dim * 4,
        "norm_layer": norm_layer, "pos_emb_drop_p": pos_drop,
        "attn_dropout": 0.0, "ffn_dropout": 0.0, "dropout": dropout,
    }


class ByteFormerTokenMerging(nn.Module):
    """Window-2 token merge that also downsamples the padding mask (reference
    cvnets/layers/token_merging.py:16 + byteformer downsamplers :384-410)."""

    opts: Any
    dim: int
    window: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, training: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, n, c = x.shape
        # reference token_merging.py:53-63: zero masked tokens, pad, unfold
        # CHANNEL-major ([B, N//w, C, w] -> C*w), reduction Linear (no bias),
        # THEN LayerNorm over dim — order and layout must match for checkpoint
        # parity (test_parity_byteformer_tiny)
        x = jnp.where(mask[..., None], 0.0, x)
        pad = (-n) % self.window
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            mask = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, pad)),
                           constant_values=1.0)
        else:
            mask = mask.astype(jnp.float32)
        n_pad = n + pad
        x = x.reshape(b, n_pad // self.window, self.window, c)
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(
            b, n_pad // self.window, c * self.window)
        x = nn.Dense(self.dim, use_bias=False, kernel_init=linear_init(self.opts),
                     dtype=compute_dtype(self.opts), name="reduction")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        # merged token is masked only if ALL constituents were masked
        new_mask = mask.reshape(b, n_pad // self.window, self.window).min(axis=-1) > 0.5
        return x, new_mask


@MODEL_REGISTRY.register(name="byteformer", type="classification")
class ByteFormer(BaseAnyNNModel):
    opts: Any = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls.__name__ != "ByteFormer":
            return parser  # subclasses (AudioByteFormer) share these flags
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.classification.byteformer.dropout", type=float,
                           default=0.0)
        group.add_argument("--model.classification.byteformer.stochastic-dropout",
                           type=float, default=0.0)
        group.add_argument("--model.classification.byteformer.norm-layer", type=str,
                           default="layer_norm")
        group.add_argument("--model.classification.byteformer.sinusoidal-pos-emb",
                           action="store_true", default=False)
        group.add_argument("--model.classification.byteformer.use-pytorch-mha",
                           action="store_true", default=False)
        group.add_argument("--model.classification.byteformer.mode", type=str,
                           default="tiny")
        group.add_argument("--model.classification.byteformer.vocab-size", type=int,
                           default=257)
        group.add_argument("--model.classification.byteformer.max-num-tokens",
                           type=int, default=50000)
        group.add_argument("--model.classification.byteformer.conv-kernel-size",
                           type=int, default=16)
        group.add_argument("--model.classification.byteformer.window-sizes",
                           type=int, nargs="+", default=[128])
        group.add_argument("--model.classification.byteformer.window-shifts",
                           type=int, nargs="+", default=None)
        group.add_argument("--model.classification.byteformer.downsample",
                           type=str, nargs="+", default=None,
                           help="Per-layer true/false: merge tokens after the layer")
        group.add_argument("--model.classification.byteformer.mask-windowed-attn",
                           action="store_true", default=False,
                           help="Strictly mask padded tokens and shifted-window "
                                "wrap-around in attention (the reference "
                                "computes but never applies these masks)")
        group.add_argument("--model.classification.byteformer.padding-index",
                           type=int, default=-1)
        group.add_argument(
            "--model.classification.byteformer.dummy-input-token-length",
            type=int, default=1024)
        return parser

    @property
    def n_classes(self) -> int:
        return getattr(self.opts, "model.classification.n_classes", 1000)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        opts = self.opts
        cfg = get_configuration(opts)
        embed_dim = cfg["embed_dim"]
        n_layers = cfg["n_transformer_layers"]
        vocab_size = getattr(opts, "model.classification.byteformer.vocab_size", 257)
        conv_k = getattr(opts, "model.classification.byteformer.conv_kernel_size", 16)
        max_tokens = getattr(opts, "model.classification.byteformer.max_num_tokens",
                             50000)
        window_sizes = getattr(opts, "model.classification.byteformer.window_sizes",
                               [128]) or [128]
        if len(window_sizes) == 1:
            window_sizes = window_sizes * n_layers
        window_shifts = getattr(opts, "model.classification.byteformer.window_shifts",
                                None) or [
            0 if i % 2 == 0 else window_sizes[i] // 2 for i in range(n_layers)
        ]
        downsample = getattr(opts, "model.classification.byteformer.downsample", None)
        if downsample is None:
            downsample = [i % 4 == 3 for i in range(n_layers)]
        else:
            downsample = [str(d).lower() in ("true", "1") for d in downsample]
        sd_prob = getattr(opts,
                          "model.classification.byteformer.stochastic_dropout",
                          0.0) or 0.0

        # padding (configurable index, reference
        # byteformer_collate_functions.py:105) -> mask; embed with the last
        # vocab slot as mask token. Negatives are always padding.
        pad_idx = getattr(
            opts, "model.classification.byteformer.padding_index", -1)
        pad_idx = -1 if pad_idx is None else pad_idx
        mask = (x == pad_idx) | (x < 0)
        ids = jnp.where(mask, vocab_size - 1, x)
        table = self.param(
            "token_embedding",
            nn.initializers.truncated_normal(stddev=float(np.sqrt(1.0 / embed_dim))),
            (vocab_size, embed_dim),
        )
        h = jnp.take(table, ids, axis=0)

        # token reduction: strided 1D conv over the sequence
        if conv_k and conv_k > 0:
            stride = max(1, conv_k // 2)
            h = nn.Conv(embed_dim, (conv_k,), strides=(stride,), padding="VALID",
                        use_bias=False, dtype=compute_dtype(opts),
                        name="token_reduction")(h)
            # mask downsampling mirrors the conv geometry: a reduced token is
            # masked iff every byte in its receptive field was padding
            m = mask.astype(jnp.float32)[..., None]  # (B, N, 1)
            mwin = nn.avg_pool(m, window_shape=(conv_k,), strides=(stride,),
                               padding="VALID")
            mask = mwin[..., 0] >= 1.0

        h = PositionalEmbedding(
            num_embeddings=max_tokens, embedding_dim=embed_dim,
            is_learnable=not getattr(
                opts, "model.classification.byteformer.sinusoidal_pos_emb", False),
            resize_mode="slice",
            name="pos_embed",
        )(h)
        if cfg["pos_emb_drop_p"] > 0:
            h = nn.Dropout(rate=cfg["pos_emb_drop_p"],
                           deterministic=not training)(h)

        for i in range(n_layers):
            h = WindowedTransformerEncoder(
                opts=opts, embed_dim=embed_dim, ffn_latent_dim=cfg["ffn_dim"],
                num_heads=cfg["n_attn_heads"], attn_dropout=cfg["attn_dropout"],
                dropout=cfg["dropout"], ffn_dropout=cfg["ffn_dropout"],
                window_size=window_sizes[i], window_shift=window_shifts[i],
                transformer_norm_layer=cfg["norm_layer"],
                stochastic_dropout=sd_prob * i / max(n_layers - 1, 1),
                name=f"transformer_{i}",
            )(h, key_padding_mask=mask, training=training)
            if downsample[i]:
                h, mask = ByteFormerTokenMerging(
                    opts=opts, dim=embed_dim, name=f"downsample_{i}",
                )(h, mask, training=training)

        h = nn.LayerNorm(epsilon=1e-5, name="post_transformer_norm")(h)
        # masked mean pool
        keep = (~mask).astype(h.dtype)[..., None]
        pooled = jnp.sum(h * keep, axis=1) / jnp.maximum(
            jnp.sum(keep, axis=1), 1.0)
        from cvnets_tpu.quantization import quant_dense

        return quant_dense(opts, training, self.n_classes,
                           kernel_init=linear_init(opts),
                           dtype=compute_dtype(opts), name="classifier")(pooled)

    def dummy_input_and_label(self, batch_size: int) -> Dict[str, Any]:
        seq = if_test_env(
            256,
            getattr(self.opts,
                    "model.classification.byteformer.dummy_input_token_length", 1024),
        )
        rng = np.random.default_rng(0)
        tokens = rng.integers(0, 256, (batch_size, seq)).astype(np.int32)
        # simulate variable-length padding
        tokens[:, seq - seq // 8:] = -1
        return {
            "samples": jnp.asarray(tokens),
            "targets": jnp.asarray(rng.integers(0, self.n_classes, (batch_size,))),
        }


@MODEL_REGISTRY.register(name="byteformer", type="audio_classification")
class AudioByteFormer(ByteFormer):
    """ByteFormer over raw audio bytes (parity: reference audio_byteformer.py:19)."""

    opts: Any = None

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.audio-classification.name", type=str,
                           default=None)
        group.add_argument("--model.audio-classification.pretrained", type=str,
                           default=None)
        return parser
