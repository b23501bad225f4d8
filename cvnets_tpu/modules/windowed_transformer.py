"""Windowed transformer encoder for long byte sequences (parity: reference
cvnets/modules/windowed_transformer.py:16-273).

Sequence is shifted (rolled), padded to a window multiple, reshaped to
(B·n_windows, window, C) — pure layout ops — and attended per window with the key
padding mask carried through. This is how ByteFormer copes with ~100k-token byte
streams (SURVEY §5 long-context notes)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.modules.transformer import TransformerEncoder


def window_partition_1d(x: jnp.ndarray, window: int,
                        shift: int) -> Tuple[jnp.ndarray, int]:
    """(B, N, C) -> (B*n_win, window, C) with optional cyclic shift; returns padded
    length for the inverse."""
    b, n, c = x.shape
    if shift:
        x = jnp.roll(x, -shift, axis=1)
    pad = (-n) % window
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    n_pad = n + pad
    x = x.reshape(b, n_pad // window, window, c).reshape(-1, window, c)
    return x, n_pad


def window_reverse_1d(x: jnp.ndarray, batch: int, n_orig: int, window: int,
                      shift: int) -> jnp.ndarray:
    n_pad = x.shape[0] // batch * window
    x = x.reshape(batch, n_pad // window, window, -1).reshape(batch, n_pad, -1)
    x = x[:, :n_orig]
    if shift:
        x = jnp.roll(x, shift, axis=1)
    return x


class WindowedTransformerEncoder(nn.Module):
    opts: Any
    embed_dim: int
    ffn_latent_dim: int
    num_heads: int = 8
    attn_dropout: float = 0.0
    dropout: float = 0.0
    ffn_dropout: float = 0.0
    window_size: int = 128
    window_shift: int = 0
    transformer_norm_layer: str = "layer_norm"
    stochastic_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 training: bool = False) -> jnp.ndarray:
        b, n, c = x.shape
        w = min(self.window_size, n)
        shift = self.window_shift % w if w else 0
        xw, _ = window_partition_1d(x, w, shift)
        mask_w = None
        if key_padding_mask is not None:
            m = key_padding_mask.astype(jnp.float32)  # 1.0 = masked
            if shift:
                m = jnp.roll(m, -shift, axis=1)
            pad = (-n) % w
            if pad:
                # window-padding slots are masked too
                m = jnp.pad(m, ((0, 0), (0, pad)), constant_values=1.0)
            mask_w = (m.reshape(-1, w) > 0.5)
        yw = TransformerEncoder(
            opts=self.opts, embed_dim=self.embed_dim,
            ffn_latent_dim=self.ffn_latent_dim, num_heads=self.num_heads,
            attn_dropout=self.attn_dropout, dropout=self.dropout,
            ffn_dropout=self.ffn_dropout,
            transformer_norm_layer=self.transformer_norm_layer,
            stochastic_dropout=self.stochastic_dropout,
            name="block",
        )(xw, None, mask_w, None, training)
        return window_reverse_1d(yw, b, n, w, shift)
