"""Fused bilinear-upsample + pixel cross-entropy for segmentation training.

The reference pipeline (cvnets/models/segmentation/base_seg.py upsampling +
loss_fn/segmentation/cross_entropy.py:19) upsamples head logits to the label
resolution and then runs fp32 CE over the full-resolution tensor.  On TPU that
materializes a (B, 512, 512, C) fp32 tensor (1.26 GB for ADE20k at batch 8)
and the CE forward+backward drags it through HBM ~20x — measured at 73 of the
99 ms DeepLabv3 step (docs/perf/PROFILE-tasks.md).

This module computes the *same* loss without ever materializing the
full-resolution logits:

- bilinear resize is a separable linear map, expressed here as two small
  dense matrices ``A_h (H, h)`` and ``A_w (W, w)``.  They are built by
  resizing an identity matrix with ``jax.image.resize``, so the interpolation
  weights match the naive path bit-for-bit.
- the output image is processed in row blocks under ``lax.scan``; each block
  computes its logits with two MXU matmuls, runs the CE in fp32, and
  accumulates only (loss_sum, valid_count).  ``jax.checkpoint`` on the block
  body makes the backward pass recompute block logits instead of storing
  them.

Accuracy: the matmuls accumulate in fp32 (``preferred_element_type``) even
for bf16 logits, so the fused path is at least as accurate as resizing in the
model dtype and casting afterwards.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def resize_matrix(out_size: int, in_size: int) -> jnp.ndarray:
    """(out, in) bilinear interpolation weights, exactly those used by
    ``jax.image.resize(method='bilinear')`` (half-pixel centers)."""
    eye = jnp.eye(in_size, dtype=jnp.float32)
    return jax.image.resize(eye, (out_size, in_size), method="bilinear")


def _pick_block(h_out: int, target: int = 64) -> int:
    """Largest divisor of h_out that is <= target (>= 1)."""
    for cand in range(min(target, h_out), 0, -1):
        if h_out % cand == 0:
            return cand
    return 1


@partial(jax.jit, static_argnames=("ignore_idx", "label_smoothing",
                                   "block_rows"))
def fused_resize_ce(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    *,
    ignore_idx: int = 255,
    label_smoothing: float = 0.0,
    class_wts: Optional[jnp.ndarray] = None,
    block_rows: int = 0,
) -> jnp.ndarray:
    """Mean pixel CE of ``bilinear_resize(logits, target.shape)`` vs target.

    Semantically identical to::

        up = jax.image.resize(logits, (B, H, W, C), 'bilinear')
        optax-style fp32 CE with ignore_idx / label_smoothing / class_wts

    but tiled so the (B, H, W, C) tensor never exists.  ``class_wts`` is a
    per-class (C,) weight vector (already computed from the target histogram
    by the caller, reference loss_fn/utils/class_weighting.py:10).
    """
    b, h, w, c = logits.shape
    hh, ww = int(target.shape[1]), int(target.shape[2])

    # TPU: one VMEM-resident Pallas kernel per (image, row-block) — HBM
    # traffic is a single read of the low-res logits + target (measured
    # A/B in docs/perf/PROFILE-tasks.md; the scan path below lost on chip).
    from cvnets_tpu.ops.pallas.seg_ce_kernel import PALLAS_OK, pallas_resize_ce

    kernel_rows = _pick_block(hh, 64)
    if (PALLAS_OK and jax.default_backend() == "tpu"
            and os.environ.get("CVNETS_TPU_SEG_CE_KERNEL", "1") == "1"
            and kernel_rows > 1):
        wts = (class_wts.astype(jnp.float32).reshape(1, c)
               if class_wts is not None else jnp.ones((1, c), jnp.float32))
        return pallas_resize_ce(
            ignore_idx, float(label_smoothing), kernel_rows, False,
            class_wts is not None,
            logits, target, resize_matrix(hh, h), resize_matrix(ww, w), wts)

    if block_rows <= 0:
        block_rows = _pick_block(hh)
    n_blk = hh // block_rows

    a_h = resize_matrix(hh, h)                      # (H, h) fp32
    a_w = resize_matrix(ww, w).astype(logits.dtype)  # (W, w)

    a_h_blocks = a_h.reshape(n_blk, block_rows, h).astype(logits.dtype)
    # (n_blk, B, r, W) so scan iterates over leading axis
    tgt_blocks = jnp.transpose(
        target.reshape(b, n_blk, block_rows, ww), (1, 0, 2, 3))

    @jax.checkpoint
    def block_loss(rows: jnp.ndarray, tgt: jnp.ndarray):
        # rows: (r, h), tgt: (B, r, W)
        # h-pass: (B, r, w, C); w-pass: (B, r, W, C) — both fp32-accumulated
        mid = jnp.einsum("rh,bhwc->brwc", rows, logits,
                         preferred_element_type=jnp.float32)
        blk = jnp.einsum("Ww,brwc->brWc", a_w, mid.astype(logits.dtype),
                         preferred_element_type=jnp.float32)
        valid = tgt != ignore_idx
        safe = jnp.where(valid, tgt, 0)
        lse = jax.nn.logsumexp(blk, axis=-1)
        picked = jnp.take_along_axis(blk, safe[..., None], axis=-1)[..., 0]
        losses = lse - picked
        if label_smoothing > 0:
            # CE vs the uniform distribution == logsumexp - mean(logits);
            # avoids materializing a dense uniform label tensor.
            smooth = lse - jnp.mean(blk, axis=-1)
            losses = (1 - label_smoothing) * losses + label_smoothing * smooth
        if class_wts is not None:
            losses = losses * jnp.take(class_wts, safe)
        losses = losses * valid
        return jnp.sum(losses), jnp.sum(valid.astype(jnp.float32))

    def body(carry, xs):
        s, n = block_loss(xs[0], xs[1])
        return (carry[0] + s, carry[1] + n), None

    (loss_sum, n_valid), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.float32(0.0)), (a_h_blocks, tgt_blocks))
    return loss_sum / jnp.maximum(n_valid, 1.0)
