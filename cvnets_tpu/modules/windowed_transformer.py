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
    """(B, N, C) -> (B*n_win, window, C). Reference order (windowed_transformer
    .py:108-113): pad to a window multiple FIRST, then cyclic-shift; returns the
    padded length for the inverse."""
    b, n, c = x.shape
    pad = (-n) % window
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    if shift:
        x = jnp.roll(x, -shift, axis=1)
    n_pad = n + pad
    x = x.reshape(b, n_pad // window, window, c).reshape(-1, window, c)
    return x, n_pad


def windows_shift_mask(n_pad: int, window: int, shift: int) -> jnp.ndarray:
    """Additive attention mask for shifted windows (reference
    windowed_transformer.py:61-88): after the cyclic shift the LAST window mixes
    sequence-end tokens with wrapped-around sequence-start tokens; block-mask it
    so the two groups don't attend to each other."""
    n_win = n_pad // window
    last = jnp.full((window, window), float("-inf"))
    keep = window - shift
    row = jnp.arange(window)
    in_head = (row < keep)
    same_group = (in_head[:, None] == in_head[None, :])
    last = jnp.where(same_group, 0.0, last)
    mask = jnp.zeros((n_win, window, window))
    return mask.at[-1].set(last)


def window_reverse_1d(x: jnp.ndarray, batch: int, n_orig: int, window: int,
                      shift: int) -> jnp.ndarray:
    n_pad = x.shape[0] // batch * window
    x = x.reshape(batch, n_pad // window, window, -1).reshape(batch, n_pad, -1)
    # un-roll on the PADDED length, then slice (reference unwindow_x:151-155);
    # slicing first would drop a real token whenever padding was added
    if shift:
        x = jnp.roll(x, shift, axis=1)
    return x[:, :n_orig]


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
        xw, n_pad = window_partition_1d(x, w, shift)
        # PARITY NOTE (reference windowed_transformer.py:248-264): the reference
        # computes a total_mask (windowed key padding + shift mask) but then
        # passes the ORIGINAL attn_mask (None) to the parent forward — its
        # windowed attention runs UNMASKED, and the published ByteFormer
        # checkpoints were trained that way. We replicate that by default so
        # converted checkpoints reproduce reference logits; masked tokens are
        # still zeroed at token merging and final pooling, exactly like the
        # reference. Set --model.classification.byteformer.mask-windowed-attn
        # for the strictly-masked variant.
        mask_w = None
        attn_mask = None
        if getattr(self.opts, "model.classification.byteformer.mask_windowed_attn",
                   False):
            if key_padding_mask is not None:
                m = key_padding_mask.astype(jnp.float32)  # 1.0 = masked
                pad = (-n) % w
                if pad:
                    m = jnp.pad(m, ((0, 0), (0, pad)), constant_values=1.0)
                if shift:
                    m = jnp.roll(m, -shift, axis=1)
                mask_w = (m.reshape(-1, w) > 0.5)
            if shift:
                # per-window additive mask; only the wrap-around window blocked
                am = windows_shift_mask(n_pad, w, shift)  # (n_win, w, w)
                am = jnp.broadcast_to(am[None], (b,) + am.shape)
                attn_mask = am.reshape(-1, 1, w, w)
        yw = TransformerEncoder(
            opts=self.opts, embed_dim=self.embed_dim,
            ffn_latent_dim=self.ffn_latent_dim, num_heads=self.num_heads,
            attn_dropout=self.attn_dropout, dropout=self.dropout,
            ffn_dropout=self.ffn_dropout,
            transformer_norm_layer=self.transformer_norm_layer,
            stochastic_dropout=self.stochastic_dropout,
            name="block",
        )(xw, None, mask_w, attn_mask, training)
        return window_reverse_1d(yw, b, n, w, shift)
