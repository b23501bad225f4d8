"""MobileViT blocks — the repo's key custom "kernel"
(parity: reference cvnets/modules/mobilevit_block.py:19-667).

TPU design: the reference's ``F.unfold``/``F.fold`` (im2col) becomes a pure
reshape+transpose in NHWC — `(B, nh, p, nw, p, C) -> (B, p*p, nh*nw, C)` — which XLA
lowers to a layout change fused with the surrounding ops; no gather/scatter. The
CoreML conv/pixel-shuffle fallbacks (:557-593) are unnecessary and dropped. A fused
Pallas kernel for unfold→separable-attention→fold lives in
cvnets_tpu/ops/pallas/mobilevit_attn.py and is used when enabled.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.layers.normalization import get_normalization_layer
from cvnets_tpu.modules.transformer import LinearAttnFFN, TransformerEncoder


def unfold_nhwc(x: jnp.ndarray, ph: int, pw: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) -> (B, P=ph*pw, N=(H/ph)*(W/pw), C); H, W must divide."""
    b, h, w, c = x.shape
    nh, nw = h // ph, w // pw
    x = x.reshape(b, nh, ph, nw, pw, c)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # B, ph, pw, nh, nw, C
    return x.reshape(b, ph * pw, nh * nw, c), (h, w)


def fold_nhwc(patches: jnp.ndarray, out_hw: Tuple[int, int], ph: int, pw: int) -> jnp.ndarray:
    """Inverse of unfold_nhwc."""
    b, p, n, c = patches.shape
    h, w = out_hw
    nh, nw = h // ph, w // pw
    x = patches.reshape(b, ph, pw, nh, nw, c)
    x = x.transpose(0, 3, 1, 4, 2, 5)  # B, nh, ph, nw, pw, C
    return x.reshape(b, h, w, c)


def _bilinear_align_corners(x: jnp.ndarray, nh: int, nw: int) -> jnp.ndarray:
    """Bilinear resize with torch ``align_corners=True`` semantics (corner
    pixels map to corner pixels), as two small matmuls — exact and
    MXU-friendly. jax.image.resize only offers half-pixel centers."""
    b, h, w, c = x.shape
    if (h, w) == (nh, nw):
        return x

    def axis_weights(src: int, dst: int) -> jnp.ndarray:
        m = np.zeros((dst, src), np.float32)
        if src == 1 or dst == 1:
            m[:, 0] = 1.0
            return jnp.asarray(m)
        pos = np.arange(dst) * (src - 1) / (dst - 1)
        i0 = np.floor(pos).astype(int)
        i1 = np.minimum(i0 + 1, src - 1)
        frac = (pos - i0).astype(np.float32)
        m[np.arange(dst), i0] += 1.0 - frac
        m[np.arange(dst), i1] += frac
        return jnp.asarray(m)

    wh = axis_weights(h, nh).astype(x.dtype)
    ww = axis_weights(w, nw).astype(x.dtype)
    return jnp.einsum("yh,bhwc,xw->byxc", wh, x, ww)


def resize_to_patch_multiple(x: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """Bilinear-resize H/W up to the next patch multiple with
    align_corners=True (reference MobileViTBlockv2.resize_input_if_needed
    :595-603); static under jit since shapes are trace-time."""
    b, h, w, c = x.shape
    if h % ph == 0 and w % pw == 0:
        return x
    nh = int(math.ceil(h / ph) * ph)
    nw = int(math.ceil(w / pw) * pw)
    return _bilinear_align_corners(x, nh, nw)


class MobileViTBlockv2(nn.Module):
    """Local rep (dw3×3 + 1×1) → unfold → LinearAttnFFN×n + norm → fold → 1×1 proj
    (reference mobilevit_block.py:329)."""

    opts: Any
    in_channels: int
    attn_unit_dim: int
    ffn_multiplier: Union[Sequence, int, float] = 2.0
    n_attn_blocks: int = 2
    attn_dropout: float = 0.0
    dropout: float = 0.0
    ffn_dropout: float = 0.0
    patch_h: int = 8
    patch_w: int = 8
    conv_ksize: int = 3
    dilation: int = 1
    attn_norm_layer: str = "layer_norm_2d"

    def _ffn_dims(self) -> list:
        d = self.attn_unit_dim
        m = self.ffn_multiplier
        if isinstance(m, Sequence) and len(m) == 2:
            dims = np.linspace(m[0], m[1], self.n_attn_blocks, dtype=float) * d
        elif isinstance(m, Sequence) and len(m) == 1:
            dims = [m[0] * d] * self.n_attn_blocks
        else:
            dims = [float(m) * d] * self.n_attn_blocks
        # reference rounds to multiples of 16
        return [int((dd // 16) * 16) for dd in dims]

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False,
                 x_prev: Optional[jnp.ndarray] = None,
                 return_patches: bool = False):
        """Spatial forward when ``x_prev`` is None (reference
        forward_spatial :605); temporal forward when ``x_prev`` carries the
        previous frame's post-norm patches (B, P, M, C) — every
        LinearAttnFFN cross-attends to them (reference forward_temporal
        :628-662). ``return_patches`` additionally returns the post-norm
        patches to chain into the next frame."""
        x = resize_to_patch_multiple(x, self.patch_h, self.patch_w)

        # local representation
        fm = ConvLayer2d(
            opts=self.opts, out_channels=self.in_channels,
            kernel_size=self.conv_ksize, stride=1, dilation=self.dilation,
            groups=self.in_channels, use_norm=True, use_act=True, name="local_dw",
        )(x, training=training)
        fm = ConvLayer2d(
            opts=self.opts, out_channels=self.attn_unit_dim, kernel_size=1,
            use_norm=False, use_act=False, name="local_pw",
        )(fm, training=training)

        patches, out_hw = unfold_nhwc(fm, self.patch_h, self.patch_w)

        ffn_dims = self._ffn_dims()
        for i in range(self.n_attn_blocks):
            patches = LinearAttnFFN(
                opts=self.opts, embed_dim=self.attn_unit_dim,
                ffn_latent_dim=ffn_dims[i], attn_dropout=self.attn_dropout,
                dropout=self.dropout, ffn_dropout=self.ffn_dropout,
                norm_layer=self.attn_norm_layer, name=f"global_rep_{i}",
            )(patches, x_prev=x_prev, training=training)
        norm = get_normalization_layer(self.opts, norm_type=self.attn_norm_layer)
        if norm is not None:
            patches = norm.copy(name="global_norm")(patches)

        fm = fold_nhwc(patches, out_hw, self.patch_h, self.patch_w)
        fm = ConvLayer2d(
            opts=self.opts, out_channels=self.in_channels, kernel_size=1,
            use_norm=True, use_act=False, name="conv_proj",
        )(fm, training=training)
        if return_patches:
            return fm, patches
        return fm


class MobileViTBlock(nn.Module):
    """MobileViTv1 block: local rep → unfold → TransformerEncoder×n → fold →
    1×1 proj → fusion 3×3 over concat(input, global)
    (reference mobilevit_block.py:19)."""

    opts: Any
    in_channels: int
    transformer_dim: int
    ffn_dim: int
    n_transformer_blocks: int = 2
    head_dim: int = 32
    attn_dropout: float = 0.0
    dropout: float = 0.0
    ffn_dropout: float = 0.0
    patch_h: int = 8
    patch_w: int = 8
    conv_ksize: int = 3
    dilation: int = 1
    no_fusion: bool = False
    transformer_norm_layer: str = "layer_norm"

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False,
                 x_prev: Optional[jnp.ndarray] = None,
                 return_patches: bool = False):
        """Spatial forward when ``x_prev`` is None (reference
        forward_spatial :268); temporal forward when ``x_prev`` carries the
        previous frame's post-norm tokens (B*P, M, C) — every transformer
        layer cross-attends to them (reference forward_temporal :290-327).
        ``return_patches`` additionally returns the post-norm tokens."""
        res = x

        fm = ConvLayer2d(
            opts=self.opts, out_channels=self.in_channels,
            kernel_size=self.conv_ksize, stride=1, dilation=self.dilation,
            use_norm=True, use_act=True, name="local_conv",
        )(x, training=training)
        fm = ConvLayer2d(
            opts=self.opts, out_channels=self.transformer_dim, kernel_size=1,
            use_norm=False, use_act=False, bias=False, name="local_pw",
        )(fm, training=training)

        # v1 resizes INSIDE unfold with align_corners=False and restores the
        # original resolution after folding (reference unfolding :194-221,
        # folding :260-262) — jax.image.resize bilinear is the same
        # half-pixel convention as torch align_corners=False
        bsz, orig_h, orig_w, _cc = fm.shape
        interpolated = orig_h % self.patch_h != 0 or orig_w % self.patch_w != 0
        if interpolated:
            nh = int(math.ceil(orig_h / self.patch_h) * self.patch_h)
            nw = int(math.ceil(orig_w / self.patch_w) * self.patch_w)
            fm = jax.image.resize(fm, (bsz, nh, nw, fm.shape[-1]),
                                  method="bilinear")

        patches, out_hw = unfold_nhwc(fm, self.patch_h, self.patch_w)
        b, p, n, c = patches.shape
        # v1 attends across patches at a fixed pixel offset: tokens along N
        # (reference :186-231); merge (B, P) as the batch for the transformer
        tokens = patches.reshape(b * p, n, c)
        num_heads = max(1, self.transformer_dim // self.head_dim)
        for i in range(self.n_transformer_blocks):
            tokens = TransformerEncoder(
                opts=self.opts, embed_dim=self.transformer_dim,
                ffn_latent_dim=self.ffn_dim, num_heads=num_heads,
                attn_dropout=self.attn_dropout, dropout=self.dropout,
                ffn_dropout=self.ffn_dropout,
                transformer_norm_layer=self.transformer_norm_layer,
                name=f"global_rep_{i}",
            )(tokens, x_prev, training=training)
        norm = get_normalization_layer(self.opts, norm_type=self.transformer_norm_layer)
        if norm is not None:
            tokens = norm.copy(name="global_norm")(tokens)
        patches = tokens.reshape(b, p, n, c)

        fm = fold_nhwc(patches, out_hw, self.patch_h, self.patch_w)
        if interpolated:
            fm = jax.image.resize(fm, (bsz, orig_h, orig_w, fm.shape[-1]),
                                  method="bilinear")
        fm = ConvLayer2d(
            opts=self.opts, out_channels=self.in_channels, kernel_size=1,
            use_norm=True, use_act=True, name="conv_proj",
        )(fm, training=training)
        if not self.no_fusion:
            fm = ConvLayer2d(
                opts=self.opts, out_channels=self.in_channels,
                kernel_size=self.conv_ksize, use_norm=True, use_act=True,
                name="fusion",
            )(jnp.concatenate([res, fm], axis=-1), training=training)
        if return_patches:
            return fm, tokens
        return fm
