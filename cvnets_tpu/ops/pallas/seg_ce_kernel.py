"""Pallas TPU kernel: fused bilinear-upsample + pixel cross-entropy.

The segmentation train step (reference: base_seg_head upsampling +
loss_fn/segmentation/cross_entropy.py:19) upsamples head logits to label
resolution and runs fp32 CE. For DeepLabv3-MobileViTv2 @512 on ADE20k (150
classes) the upsampled logits are 1.26 GB fp32 per head and the CE
forward+backward drags them through HBM repeatedly — measured at 73 of the
99.5 ms step (docs/perf/PROFILE-tasks.md). An XLA `lax.scan` re-tiling
(ops/seg_ce.py) halves the bytes but serializes into small kernels and came
out *slower* (76 vs 82 img/s). This path keeps every full-resolution tile in
VMEM: the (B, H, W, C) logits never exist anywhere.

Two stages, split so every in-kernel op is Mosaic-friendly (the first cut
fused both interp matmuls in one kernel and died in `infer-vector-layout`:
re-tiling `(R, w*C) -> (w, R*C)` splits the lane dimension, which Mosaic's
reshape cannot do):

1. XLA: ``hmid[b, i, w, c] = sum_h A_h[i, h] * logits[b, h, w, c]`` — the
   row (height) interpolation, a tiny einsum (~5 GFLOP; for the DeepLab
   shape a 157 MB fp32 / 78 MB bf16 write, ~0.3 ms of HBM round-trip at
   v5e bandwidth).
2. Pallas, grid (B, H/R): each step holds an ``(R, w, C)`` block of hmid in
   VMEM and loops r = 0..R-1: one MXU matmul ``A_w (W, w) @ hmid_r (w, C)``
   produces the full-res row ``(W, C)`` with classes on lanes, then a
   stable logsumexp, one-hot pick (lane-iota compare + masked sum — no
   gather op on TPU), ignore mask, label smoothing (CE vs uniform ==
   lse - mean), optional per-class weights (statically skipped when
   weighting is off). Only ``(loss_sum, n_valid)`` scalars leave the kernel
   (SMEM accumulators; the TPU grid is sequential so += across steps is
   safe).

Layout note: a classes-on-sublanes variant ((C, W) tiles, 150->152 sublane
padding instead of 150->256 lane padding) would cut the CE's VPU work ~1.7x,
but its backward kernel stalls the Mosaic compiler for >30 minutes at the
DeepLab shape (v5e, 2026-08-20; fwd compiles in 16 s — the stall is in the
bwd body regardless of fori vs static unroll). The classes-on-lanes layout
here compiles in minutes and is what shipped.

Dtype: everything runs fp32, including for bf16 logits (cast on VMEM load).
Every bf16-matmul variant tried stalls the Mosaic compile helper for
10-30+ minutes at the DeepLab shape (see _h_interp); the ~5 ms/step it
would save is not worth an unbounded compile. The CE is fp32 either way —
the reference's loss is fp32 after upsampling.

``A_h (H, h)`` / ``A_w (W, w)`` are dense bilinear interpolation matrices
built by resizing an identity (ops/seg_ce.py:resize_matrix) — bit-identical
weights to ``jax.image.resize(method='bilinear')``. Dense costs ~w/2 more
MXU FLOPs than the 2-tap structure but ~40 GFLOP/step here is noise next to
the ~29 GB of HBM traffic it removes.

Backward (custom_vjp) recomputes hmid (stage-1 einsum again) and each row's
logits, forms ``G = [softmax - (1-ls)*onehot - ls/C] * (wt * valid *
gbar/n_valid)`` and pushes it through ``A_w^T (w, W) @ G (W, C)`` into a
``dhmid`` block written once per grid step; XLA then contracts
``dlogits = einsum('Hh,bHwc->bhwc', A_h, dhmid)``. dlogits accumulates in
fp32 regardless of the logits dtype.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_OK = True
except Exception:  # pragma: no cover
    PALLAS_OK = False


def _row_terms(col, tgt, wts_ref, ignore_idx, ls, use_wts):
    """CE terms for one full-res row: col (W, C) fp32, tgt (W, 1) int32.

    Returns (loss_pix, wt, valid_f, onehot, e) — (W, 1) or (W, C)."""
    valid = tgt != ignore_idx
    safe = jnp.where(valid, tgt, 0)                        # (W, 1)
    m = jnp.max(col, axis=-1, keepdims=True)
    e = jnp.exp(col - m)
    lse = m + jnp.log(jnp.sum(e, axis=-1, keepdims=True))  # (W, 1)
    cid = jax.lax.broadcasted_iota(jnp.int32, col.shape, 1)
    onehot = (cid == safe).astype(jnp.float32)             # (W, C)
    picked = jnp.sum(col * onehot, axis=-1, keepdims=True)
    loss_pix = lse - picked
    if ls > 0.0:
        loss_pix = (1.0 - ls) * loss_pix \
            + ls * (lse - jnp.mean(col, axis=-1, keepdims=True))
    if use_wts:
        wt = jnp.sum(onehot * wts_ref[:], axis=-1, keepdims=True)
    else:
        wt = jnp.float32(1.0)
    return loss_pix, wt, valid.astype(jnp.float32), onehot, e


def _fwd_kernel(hm_ref, aw_ref, tgt_ref, wts_ref, loss_ref, cnt_ref,
                *, r_blk, ignore_idx, ls, use_wts):
    b, i = pl.program_id(0), pl.program_id(1)

    @pl.when((b == 0) & (i == 0))
    def _():
        loss_ref[0, 0] = 0.0
        cnt_ref[0, 0] = 0.0

    def body(k, carry):
        ls_sum, n_val = carry
        col = jnp.dot(aw_ref[:], hm_ref[0, k].astype(jnp.float32),
                      preferred_element_type=jnp.float32)  # (W, C) fp32
        loss_pix, wt, vf, _, _ = _row_terms(
            col, tgt_ref[0, k], wts_ref, ignore_idx, ls, use_wts)
        return (ls_sum + jnp.sum(loss_pix * wt * vf),
                n_val + jnp.sum(vf))

    s, n = jax.lax.fori_loop(
        0, r_blk, body, (jnp.float32(0.0), jnp.float32(0.0)))
    loss_ref[0, 0] += s
    cnt_ref[0, 0] += n


def _bwd_kernel(hm_ref, aw_ref, awt_ref, tgt_ref, wts_ref, scale_ref,
                dhm_ref, *, r_blk, c, ignore_idx, ls, use_wts):
    def body(k, _):
        col = jnp.dot(aw_ref[:], hm_ref[0, k].astype(jnp.float32),
                      preferred_element_type=jnp.float32)  # (W, C) fp32
        _, wt, vf, onehot, e = _row_terms(
            col, tgt_ref[0, k], wts_ref, ignore_idx, ls, use_wts)
        sm = e / jnp.sum(e, axis=-1, keepdims=True)        # softmax (W, C)
        g = sm - (1.0 - ls) * onehot
        if ls > 0.0:
            g = g - (ls / c)
        g = g * (wt * vf * scale_ref[0, 0])
        dhm_ref[0, k] = jnp.dot(awt_ref[:], g,
                                preferred_element_type=jnp.float32)  # (w, C)
        return 0

    jax.lax.fori_loop(0, r_blk, body, 0)


def _vmem_params():
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _h_interp(logits, ah):
    """Stage 1: (B, h, w, C) -> fp32 (B, H, w, C) row interpolation.

    Kept fp32 end-to-end: every bf16 in-kernel variant tried (bf16 dots in
    either layout, per-row grids, static unrolls) stalls the Mosaic compile
    helper for 10-30+ minutes at the DeepLab shape (v5e, 2026-08-20), while
    this fp32 version compiles in minutes. The bf16 win (~4x MXU on ~40
    GFLOP + halved hmid bytes) is ~5 ms/step — not worth an unbounded
    compile. Revisit on a newer libtpu."""
    return jnp.einsum("Hh,bhwc->bHwc", ah, logits,
                     preferred_element_type=jnp.float32)


def _run_fwd(hmid, aw, target4, wts, *, r, ignore_idx, ls, use_wts,
             interpret):
    bsz, big_h, w, c = hmid.shape
    big_w = target4.shape[2]
    kern = partial(_fwd_kernel, r_blk=r, ignore_idx=ignore_idx, ls=ls,
                   use_wts=use_wts)
    loss, cnt = pl.pallas_call(
        kern,
        grid=(bsz, big_h // r),
        in_specs=[
            pl.BlockSpec((1, r, w, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((big_w, w), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, big_w, 1), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * big_h * big_w * w * c,
            bytes_accessed=hmid.size * hmid.dtype.itemsize
            + target4.size * 4,
            transcendentals=bsz * big_h * big_w * c,
        ),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(hmid, aw, target4, wts)
    return loss[0, 0], cnt[0, 0]


def _run_bwd(hmid, aw, target4, wts, scale, *, r, ignore_idx, ls, use_wts,
             interpret):
    bsz, big_h, w, c = hmid.shape
    big_w = target4.shape[2]
    kern = partial(_bwd_kernel, r_blk=r, c=c, ignore_idx=ignore_idx, ls=ls,
                   use_wts=use_wts)
    dhm = pl.pallas_call(
        kern,
        grid=(bsz, big_h // r),
        in_specs=[
            pl.BlockSpec((1, r, w, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((big_w, w), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, big_w), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, big_w, 1), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, r, w, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, big_h, w, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * big_h * big_w * w * c,
            bytes_accessed=hmid.size * hmid.dtype.itemsize
            + bsz * big_h * w * c * 4 + target4.size * 4,
            transcendentals=bsz * big_h * big_w * c,
        ),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(hmid, aw, aw.T, target4, wts, scale)
    return dhm


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def pallas_resize_ce(ignore_idx, ls, block_rows, interpret, use_wts,
                     logits, target, ah, aw, wts):
    """Mean pixel CE of bilinear_resize(logits -> target res) vs target.

    logits (B, h, w, C) any float dtype; target (B, H, W) int32 with
    `ignore_idx` holes; ah (H, h) / aw (W, w) fp32 interpolation matrices
    (ops/seg_ce.py:resize_matrix); wts (1, C) fp32 per-class weights —
    ignored (pass ones) when ``use_wts`` is False, which statically skips
    the weighting multiply in the kernels. H must be divisible by
    block_rows — the dispatcher in ops/seg_ce.py falls back to the XLA
    path otherwise.
    """
    loss, _ = _fwd_core(ignore_idx, ls, block_rows, interpret, use_wts,
                        logits, target, ah, aw, wts)
    return loss


def _fwd_core(ignore_idx, ls, block_rows, interpret, use_wts,
              logits, target, ah, aw, wts):
    b = logits.shape[0]
    hh, ww = target.shape[1], target.shape[2]
    hmid = _h_interp(logits, ah)
    loss_sum, cnt = _run_fwd(
        hmid, aw, target.reshape(b, hh, ww, 1),
        wts.reshape(1, -1), r=block_rows, ignore_idx=ignore_idx, ls=ls,
        use_wts=use_wts, interpret=interpret)
    cnt = jnp.maximum(cnt, 1.0)
    return loss_sum / cnt, cnt


def _fwd_rule(ignore_idx, ls, block_rows, interpret, use_wts,
              logits, target, ah, aw, wts):
    loss, cnt = _fwd_core(ignore_idx, ls, block_rows, interpret, use_wts,
                          logits, target, ah, aw, wts)
    return loss, (logits, target, ah, aw, wts, cnt)


def _bwd_rule(ignore_idx, ls, block_rows, interpret, use_wts, res, gbar):
    logits, target, ah, aw, wts, cnt = res
    b, h, w, c = logits.shape
    hh, ww = target.shape[1], target.shape[2]
    scale = (gbar.astype(jnp.float32) / cnt).reshape(1, 1)
    hmid = _h_interp(logits, ah)  # recompute: cheaper than storing it
    dhm = _run_bwd(
        hmid, aw, target.reshape(b, hh, ww, 1),
        wts.reshape(1, -1), scale, r=block_rows, ignore_idx=ignore_idx,
        ls=ls, use_wts=use_wts, interpret=interpret)
    dlg = jnp.einsum("Hh,bHwc->bhwc", ah, dhm,
                     preferred_element_type=jnp.float32)
    f0 = np.zeros(target.shape, dtype=jax.dtypes.float0)
    return (dlg.astype(logits.dtype), f0,
            jnp.zeros_like(ah), jnp.zeros_like(aw), jnp.zeros_like(wts))


pallas_resize_ce.defvjp(_fwd_rule, _bwd_rule)
