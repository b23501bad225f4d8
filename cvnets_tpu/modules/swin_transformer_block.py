"""Swin transformer blocks (parity: reference cvnets/modules/swin_transformer_block.py:16-410).

NHWC window partition is reshape+transpose (no gather); shifted windows use
``jnp.roll`` + additive attention masks computed from static shapes at trace time,
so everything stays XLA-static. Relative position bias is a learned table indexed by
a precomputed static index map.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cvnets_tpu.layers.dtype_utils import compute_dtype
from cvnets_tpu.layers.init_utils import linear_init
from cvnets_tpu.layers.random_layers import StochasticDepth


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C); H, W divisible by ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def relative_position_index(ws: int) -> np.ndarray:
    """Static (ws², ws²) index into the (2ws-1)² bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def shifted_window_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Static additive mask (nW, ws², ws²) for SW-MSA."""
    img_mask = np.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wslice in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wslice, :] = cnt
            cnt += 1
    mask_windows = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    mask_windows = mask_windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    opts: Any
    dim: int
    num_heads: int
    window_size: int
    attn_dropout: float = 0.0
    proj_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 training: bool = False) -> jnp.ndarray:
        bnw, n, c = x.shape
        h = self.num_heads
        hd = self.dim // h
        from cvnets_tpu.quantization import quant_dense

        dt = compute_dtype(self.opts)
        qkv = quant_dense(self.opts, training, 3 * self.dim, use_bias=True,
                          kernel_init=linear_init(self.opts),
                          dtype=dt, name="qkv")(x)
        # thirds of the fused projection keep the (bnw, n, H·D) packed-head
        # layout the fused kernel consumes; the einsum path reshapes below
        q, k, v = jnp.split(qkv, 3, axis=-1)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        idx = relative_position_index(self.window_size)
        bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)

        # Fused biased window-attention kernel (ops/pallas/window_attn.py):
        # the per-window (S, S) logits never leave VMEM. Eligible whenever
        # attention probs are not needed in HBM (no dropout on them).
        from cvnets_tpu.ops.pallas.mha_attn import _use_pallas
        from cvnets_tpu.ops.pallas.window_attn import (
            fused_window_attention,
            window_attention_eligible,
        )

        if (getattr(self.opts, "model.enable_pallas_kernels", True)
                and _use_pallas() and window_attention_eligible(n, self.dim)
                and (self.attn_dropout == 0 or not training)):
            out = fused_window_attention(q * hd**-0.5, k, v, h, bias, mask)
        else:
            q, k, v = (t.reshape(bnw, n, h, hd) for t in (q, k, v))
            logits = jnp.einsum("bnhd,bmhd->bhnm", q * hd**-0.5, k)
            logits = logits + bias[None].astype(logits.dtype)
            if mask is not None:
                nw = mask.shape[0]
                logits = logits.reshape(bnw // nw, nw, h, n, n)
                logits = logits + mask[None, :, None].astype(logits.dtype)
                logits = logits.reshape(bnw, h, n, n)
            attn = nn.softmax(
                logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
            if self.attn_dropout > 0:
                attn = nn.Dropout(rate=self.attn_dropout,
                                  deterministic=not training)(attn)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(
                bnw, n, self.dim)
        out = quant_dense(self.opts, training, self.dim,
                          kernel_init=linear_init(self.opts), dtype=dt,
                          name="proj")(out)
        if self.proj_dropout > 0:
            out = nn.Dropout(rate=self.proj_dropout, deterministic=not training)(out)
        return out


class SwinTransformerBlock(nn.Module):
    """W-MSA/SW-MSA + MLP block over NHWC feature maps
    (reference swin_transformer_block.py:326)."""

    opts: Any
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attn_dropout: float = 0.0
    stochastic_depth_prob: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        # the window is NEVER shrunk (reference/torchvision semantics): small
        # maps are padded up to one full window and shift is disabled; the
        # relative-position table stays (2W-1)^2 so checkpoints are
        # resolution-independent
        ws = self.window_size
        pad_h = (-h) % ws
        pad_w = (-w) % ws
        hp, wp = h + pad_h, w + pad_w
        shift = self.shift_size if ws < min(hp, wp) else 0

        shortcut = x
        # norm BEFORE padding (reference pads inside the attention fn, after
        # norm1): the pad region must be zeros, not LN bias values
        y = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False,
                         name="norm1")(x)
        y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shifted_window_mask(hp, wp, ws, shift))
        else:
            mask = None
        windows = window_partition(y, ws)
        attn_windows = WindowAttention(
            opts=self.opts, dim=self.dim, num_heads=self.num_heads, window_size=ws,
            attn_dropout=self.attn_dropout, proj_dropout=self.dropout, name="attn",
        )(windows, mask=mask, training=training)
        y = window_reverse(attn_windows, ws, hp, wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w, :]
        y = StochasticDepth(p=self.stochastic_depth_prob)(y, training=training)
        x = shortcut + y

        from cvnets_tpu.quantization import quant_dense

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        dt = compute_dtype(self.opts)
        y = quant_dense(self.opts, training, int(self.dim * self.mlp_ratio),
                        kernel_init=linear_init(self.opts), dtype=dt,
                        name="mlp_fc1")(y)
        # the MLP activation comes from the model config (reference builds it
        # from opts model.activation.name; swin recipes set gelu)
        from cvnets_tpu.layers.activation import build_act_layer

        y = build_act_layer(self.opts)(y)
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)
        y = quant_dense(self.opts, training, self.dim,
                        kernel_init=linear_init(self.opts), dtype=dt,
                        name="mlp_fc2")(y)
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)
        y = StochasticDepth(p=self.stochastic_depth_prob)(y, training=training)
        return x + y


class PatchMerging(nn.Module):
    """2×2 spatial merge: concat 4 neighbors → LN → Linear(4C→2C)
    (reference swin_transformer_block.py:45)."""

    opts: Any
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        pad_h, pad_w = h % 2, w % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            h, w = h + pad_h, w + pad_w
        # concat order is [x(0,0), x(1,0), x(0,1), x(1,1)] — torchvision's
        # _patch_merging_pad convention, which the reference reuses; a plain
        # reshape would give [x(0,0), x(0,1), x(1,0), x(1,1)] and scramble
        # checkpoint channels
        x = jnp.concatenate([
            x[:, 0::2, 0::2, :], x[:, 1::2, 0::2, :],
            x[:, 0::2, 1::2, :], x[:, 1::2, 1::2, :],
        ], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False,
                        kernel_init=linear_init(self.opts),
                        dtype=compute_dtype(self.opts), name="reduction")(x)
