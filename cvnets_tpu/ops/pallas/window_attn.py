"""Fused windowed attention (Swin) Pallas kernel with additive logit bias.

Swin's ``WindowAttention`` (reference algorithm:
cvnets/modules/swin_transformer_block.py:156-234 — QK^T + relative-position
bias (+ shift mask) → softmax → ·V) runs over thousands of tiny windows:
Swin-T stage 1 at 224² with batch 128 is 8192 windows × 3 heads × 49² logits
≈ 236 MB of f32 HBM traffic per pass in einsum form, re-read for softmax and
the context matmul; summed over stages the logits traffic dominates the
block's cost. Each (49, 49) tile is tiny, so the whole window fits VMEM and
the fusion removes that traffic entirely.

Layout: q/k/v arrive as (B, nW, S, E) — the window-partitioned projection
layout with heads packed in E = H·D, q pre-scaled. The bias is one f32
(nWb, H, S, S) tensor: the learned relative-position table gathered to
(H, S, S) plus, for shifted windows, the per-window shift mask (nWb = nW;
un-shifted layers pass nWb = 1). Grid is (nW, B) with batch innermost: each
cell owns one window's (S, E) q/k/v/out tiles and loops heads with static
lane slices; only (B, nW, S, E) tensors and the small bias ever reach HBM.

Backward is a single kernel (full S fits VMEM — no KV blocking needed) using
the same recompute trick as ``mha_attn.py``, plus the bias cotangent: dbias
is the pre-softmax logit gradient ds accumulated over the batch-inner grid
dim into a block that stays resident per window. Under GSPMD the batch dim
is declared shardable; dbias is a cross-batch reduction, so the partition
lowering psums it over the batch mesh axis (``reduction_factors`` marks the
factor for Shardy's propagation; the collective itself lives in the
per-shard lowering).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

from cvnets_tpu.ops.pallas import mha_attn as _base

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_MAX_SEQ = 512        # (S, S) f32 logits per head must fit VMEM
_MAX_EMBED = 1024

# --- multi-window packing (round 4: the PROFILE-swin.md upper-bound rework) ---
# A lone 49-token window fills 38% of the 128-wide lanes and runs the kernel at
# 0.574 of its bytes-roofline (measured r3). Packing P consecutive windows into
# one (P*S, E) tile is a FREE reshape (windows are contiguous on the window
# axis). The QK^T and PV matmuls run on the full packed (PS, PS) tile — the
# padded cross-window FLOPs are ~3% of step FLOPs, free on a bandwidth-bound
# model, while MXU M/N fill rises ~P x. Softmax, however, is NOT run on the
# packed tile: a first cut that materialized a block-diagonal -1e9 bias and
# softmaxed all PS^2 logits measured 806 img/s on v5e — the P x extra VPU
# transcendentals repaid most of the MXU win. Instead the kernels extract the
# (PS, S) diagonal BAND (each row's own window columns — exactly the logits
# that are nonzero after masking), softmax the band (same exp count as
# unpacked, full sublane occupancy), and scatter the band back into a zeroed
# block-diagonal E tile for the PV matmul (stores are cheap; exps are not).
# The bias stays compact (P, H, S, S) per packed group — no -1e9 blocks ever
# reach HBM. Pack factor per layer is capped by the packed-logits seq bound
# and a per-grid-cell VMEM model (the backward holds q/k/v/o/do tiles, the
# bias + dbias blocks, and the (PS, PS) scratch inside ~16 MB scoped VMEM).
_PACK_TARGET = 512               # packed tokens per tile
_VMEM_BUDGET = 12 * 2 ** 20      # conservative per-cell bound (16 MB scoped)


def _pack_vmem_bytes(p: int, s: int, e: int, heads: int, elt: int = 2) -> int:
    """Rough backward-kernel VMEM footprint for pack factor ``p``: 10 I/O
    (PS, E) tiles double-buffered + bias/dbias (P, H, S, S) f32 blocks
    double-buffered + (PS, PS) f32 scratch (logits, E/DS assembly) + bands."""
    ps = p * s
    io = 10 * ps * e * elt * 2
    bias = 2 * p * heads * s * s * 4 * 2
    scratch = 3 * ps * ps * 4 + 2 * ps * s * 4
    return io + bias + scratch


def _pick_pack(bnw: int, nw: int, s: int, e: int, heads: int,
               elt: int = 2) -> int:
    """Largest P in {8,4,2} that divides the packing axis (the per-image
    window axis when a shift mask makes windows distinct, else the flat
    batch*window axis), keeps P*S <= _PACK_TARGET, and fits the VMEM model
    at the ACTUAL q/k/v element size (f32 doubles the I/O tile term).
    1 = no packing."""
    limit = nw if nw > 1 else bnw
    for cand in (8, 4, 2):
        if limit % cand:
            continue
        if cand * s > _PACK_TARGET:
            continue
        if _pack_vmem_bytes(cand, s, e, heads, elt=elt) > _VMEM_BUDGET:
            continue
        return cand
    return 1


def _group_bias(bias: jnp.ndarray, p: int) -> jnp.ndarray:
    """(W, H, S, S) per-window additive bias -> compact (max(W//p,1), P, H,
    S, S) grouped bias (consecutive windows group; W == 1 repeats the shared
    block). No block-diagonal padding is materialized — the kernels only
    compute the diagonal band, so cross-window logits never exist."""
    w, h, s, _ = bias.shape
    if w == 1:
        return jnp.broadcast_to(bias[:, None], (1, p, h, s, s))
    return bias.reshape(w // p, p, h, s, s)

# Disabled by default after A/Bs on real v5e hardware (Swin-T train step,
# batch 128 @ 224px, scan, value readback; docs/perf/PROFILE-swin.md):
#   r3 (2026-08-18), unpacked per-window tiles:
#     XLA einsum path:  844 img/s, 123.5 GB/step — 0.994 of its own
#                       bytes-roofline (XLA is AT speed-of-light for the
#                       bytes it moves)
#     unpacked kernel:  641 img/s,  93.9 GB/step — 0.574 of its roofline
#   r4 (2026-08-19), multi-window packing (this file's current form):
#     XLA einsum path:  847 img/s — 0.997 of its roofline (re-measured)
#     packed, full-tile softmax (block-diag -1e9 bias): 807 img/s — 0.765
#     packed, banded softmax (band extract/scatter):    619 img/s — 0.580
# Packing fixed the MXU fill as designed (MFU 0.092 -> 0.134) but the
# PROFILE-swin +32% upper bound assumed the saved bytes execute at XLA
# efficiency; in practice the packed kernel still runs at ~0.77 of its own
# roofline (grid/dispatch overheads on 8192-cell grids, f32 VMEM scratch) and
# the banded variant's two extra (PS, PS) MXU matmuls per head cost more than
# the P x softmax transcendentals they avoid. Both variants LOSE to XLA, so
# honest eligibility stays False.
# Full writeup: docs/perf/PROFILE-swin.md. Re-enable for experiments with
# CVNETS_TPU_FORCE_WINDOW_KERNEL=1.


def window_attention_eligible(seq: int, embed: int) -> bool:
    import os

    if os.environ.get("CVNETS_TPU_FORCE_WINDOW_KERNEL", "0") != "1":
        return False
    return _PALLAS_OK and seq <= _MAX_SEQ and embed <= _MAX_EMBED


# --------------------------------------------------------------- forward


def _band_helpers(p: int, s: int):
    """Trace-time constants for banded packing, hoisted out of the head loop:
    ``same`` — (PS, PS) bool, blk(i) == blk(j); ``r`` — (PS, S) f32 binary
    selection matrix R[j, jj] = (j mod S == jj). All built from iota/compare
    (Mosaic-lowerable; arbitrary-offset slicing at S=49 is not — slices at
    non-tile-aligned offsets fail 'offset mismatch on non-concat dimension')."""
    ps = p * s
    rows = jax.lax.broadcasted_iota(jnp.int32, (ps, ps), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ps, ps), 1)
    same = (rows // s) == (cols // s)
    jr = jax.lax.broadcasted_iota(jnp.int32, (ps, s), 0)
    jc = jax.lax.broadcasted_iota(jnp.int32, (ps, s), 1)
    r = (jr % s == jc).astype(jnp.float32)
    return same, r


def _band_extract(full, same, r):
    """(PS, PS) tile -> (PS, S) diagonal band via mask + matmul with the
    binary selector: band[i, jj] = full[i, blk(i)*S + jj]. One dense MXU
    matmul (K = PS, full k-fill) instead of unaligned slicing."""
    fullm = jnp.where(same, full, jnp.zeros((), full.dtype))
    return jnp.dot(fullm, r, preferred_element_type=jnp.float32)


def _band_scatter(band, same, p: int):
    """(PS, S) band -> (PS, PS) block-diagonal tile, zeros elsewhere:
    tile the band along columns (uniform-offset concat) and mask. VPU
    selects/stores only — no transcendentals on the padding."""
    tiled = jnp.concatenate([band] * p, axis=1)         # [i, j] = band[i, j%S]
    return jnp.where(same, tiled, jnp.zeros((), band.dtype))


def _head_softmax(q, k, bias_h, same, r, s: int):
    """One head's banded softmax. ``bias_h`` is the compact (P, S, S) block.
    Returns the (PS, S) band exp and the (PS, 1) row sums — exp/max/sum run
    on P*S*S band elements (the unpacked count), not the (PS)^2 tile."""
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (PS, PS)
    band = _band_extract(logits, same, r) + bias_h.reshape(-1, s)
    m = jnp.max(band, axis=-1, keepdims=True)
    e = jnp.exp(band - m)
    ones = jnp.ones((s, 1), jnp.float32)
    l = jnp.dot(e, ones, preferred_element_type=jnp.float32)          # (PS, 1)
    return e, l


def _head_softmax_unpacked(q, k, bias_h):
    """p == 1 path: plain biased softmax on the (S, S) tile."""
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    band = logits + bias_h.reshape(logits.shape)
    m = jnp.max(band, axis=-1, keepdims=True)
    e = jnp.exp(band - m)
    ones = jnp.ones((e.shape[-1], 1), jnp.float32)
    l = jnp.dot(e, ones, preferred_element_type=jnp.float32)
    return e, l


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, heads: int):
    p = bias_ref.shape[1]
    s = bias_ref.shape[-1]
    d = q_ref.shape[-1] // heads
    same, r = _band_helpers(p, s) if p > 1 else (None, None)
    for hi in range(heads):
        sl = slice(hi * d, (hi + 1) * d)
        q = q_ref[0, 0, :, sl].astype(jnp.float32)      # (PS, D), pre-scaled
        k = k_ref[0, 0, :, sl].astype(jnp.float32)
        v = v_ref[0, 0, :, sl].astype(jnp.float32)
        if p > 1:
            e, l = _head_softmax(q, k, bias_ref[0, :, hi], same, r, s)
            efull = _band_scatter(e, same, p)           # (PS, PS) block-diag
        else:
            efull, l = _head_softmax_unpacked(q, k, bias_ref[0, :, hi])
        out = jnp.dot(efull, v, preferred_element_type=jnp.float32) / l
        out_ref[0, 0, :, sl] = out.astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, out_in_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, heads: int):
    b = pl.program_id(1)                               # batch-inner grid dim

    @pl.when(b == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    p = bias_ref.shape[1]
    s = bias_ref.shape[-1]
    d = q_ref.shape[-1] // heads
    same, r = _band_helpers(p, s) if p > 1 else (None, None)
    for hi in range(heads):
        sl = slice(hi * d, (hi + 1) * d)
        q = q_ref[0, 0, :, sl].astype(jnp.float32)
        k = k_ref[0, 0, :, sl].astype(jnp.float32)
        v = v_ref[0, 0, :, sl].astype(jnp.float32)
        o = out_in_ref[0, 0, :, sl].astype(jnp.float32)
        do = do_ref[0, 0, :, sl].astype(jnp.float32)

        if p > 1:                                       # recompute
            e, l = _head_softmax(q, k, bias_ref[0, :, hi], same, r, s)
            efull = _band_scatter(e, same, p)
        else:
            efull, l = _head_softmax_unpacked(q, k, bias_ref[0, :, hi])
            e = efull
        do_n = do / l                                   # folds P = e/l scale
        dv = jax.lax.dot_general(efull, do_n, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp_full = jax.lax.dot_general(do_n, v, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = _band_extract(dp_full, same, r) if p > 1 else dp_full
        delta = jnp.sum(do_n * o, axis=-1, keepdims=True)   # (PS, 1)
        ds = e * (dp - delta)                           # banded dL/dlogits
        dsfull = _band_scatter(ds, same, p) if p > 1 else ds
        dq = jnp.dot(dsfull, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(dsfull, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, 0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, 0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0, :, sl] = dv.astype(dv_ref.dtype)
        dbias_ref[0, :, hi] += ds.reshape(p, s, s)


def _qkv_spec(s: int, e: int):
    return pl.BlockSpec((1, 1, s, e), lambda w, b: (b, w, 0, 0),
                        memory_space=pltpu.VMEM)


def _bias_spec(nwb: int, p: int, heads: int, s: int):
    return pl.BlockSpec((1, p, heads, s, s),
                        lambda w, b: (w % nwb, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _pallas_fwd(q, k, v, bias, heads):
    b, nw, ps, e = q.shape            # ps = P*S packed tokens per tile
    nwb, p, _, s, _ = bias.shape
    elt = jnp.dtype(q.dtype).itemsize
    cost = pl.CostEstimate(
        # QK^T and PV run on the packed (PS, PS) tile; softmax on the band
        flops=4 * b * nw * ps * ps * e,
        bytes_accessed=b * nw * ps * e * elt * 4 + bias.size * 4,
        transcendentals=b * nw * heads * ps * s,
    )
    return pl.pallas_call(
        partial(_fwd_kernel, heads=heads),
        cost_estimate=cost,
        interpret=_base._INTERPRET,
        grid=(nw, b),
        in_specs=[_qkv_spec(ps, e)] * 3 + [_bias_spec(nwb, p, heads, s)],
        out_specs=_qkv_spec(ps, e),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v, bias)


def _pallas_bwd(q, k, v, bias, out, do, heads):
    b, nw, ps, e = q.shape
    nwb, p, _, s, _ = bias.shape
    elt = jnp.dtype(q.dtype).itemsize
    cost = pl.CostEstimate(
        flops=10 * b * nw * ps * ps * e,
        bytes_accessed=b * nw * ps * e * elt * 8 + 2 * bias.size * 4,
        transcendentals=b * nw * heads * ps * s,
    )
    return pl.pallas_call(
        partial(_bwd_kernel, heads=heads),
        cost_estimate=cost,
        interpret=_base._INTERPRET,
        grid=(nw, b),
        in_specs=[_qkv_spec(ps, e)] * 3 + [_bias_spec(nwb, p, heads, s)]
        + [_qkv_spec(ps, e)] * 2,
        out_specs=[_qkv_spec(ps, e)] * 3 + [_bias_spec(nwb, p, heads, s)],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3
        + [jax.ShapeDtypeStruct(bias.shape, jnp.float32)],
    )(q, k, v, bias, out, do)


# --------------------------------------------------- GSPMD partitioning
# Batch dim shardable (data parallelism); the window/seq/embed/bias dims must
# be replicated. dbias is a reduction over the batch factor — each shard
# computes its partial and the lowering psums over the batch mesh axis.


def _batch_axis(arg_infos):
    spec = arg_infos[0].sharding.spec
    return spec[0] if len(spec) else None


def _part_fwd(heads, mesh, arg_infos, result_infos):
    ax = _batch_axis(arg_infos)
    qsh = NamedSharding(mesh, PartitionSpec(ax, None, None, None))
    bsh = NamedSharding(mesh, PartitionSpec(None, None, None, None, None))

    def lower(q, k, v, bias):
        return _pallas_fwd(q, k, v, bias, heads)

    return mesh, lower, qsh, (qsh, qsh, qsh, bsh)


def _part_bwd(heads, mesh, arg_infos, result_infos):
    ax = _batch_axis(arg_infos)
    qsh = NamedSharding(mesh, PartitionSpec(ax, None, None, None))
    bsh = NamedSharding(mesh, PartitionSpec(None, None, None, None, None))

    def lower(q, k, v, bias, out, do):
        dq, dk, dv, dbias = _pallas_bwd(q, k, v, bias, out, do, heads)
        if ax is not None:
            dbias = jax.lax.psum(dbias, ax)
        return dq, dk, dv, dbias

    return mesh, lower, (qsh, qsh, qsh, bsh), (qsh,) * 3 + (bsh, qsh, qsh)


_fwd_sharded = custom_partitioning(_pallas_fwd, static_argnums=(4,))
_fwd_sharded.def_partition(
    partition=_part_fwd,
    sharding_rule="b w s e, b w s e, b w s e, n p h t u -> b w s e",
    need_replication_factors=("w", "s", "e", "n", "p", "h", "t", "u"),
)

# NOTE: `b` is a reduction factor for dbias, but Shardy rejects a declared
# reduction factor that also appears in results (dq/dk/dv carry b), so the
# rule leaves b as passthrough; the partition callback pins dbias replicated
# and the lowering psums the per-shard partials over the batch mesh axis.
_bwd_sharded = custom_partitioning(_pallas_bwd, static_argnums=(6,))
_bwd_sharded.def_partition(
    partition=_part_bwd,
    sharding_rule=("b w s e, b w s e, b w s e, n p h t u, b w s e, b w s e"
                   " -> b w s e, b w s e, b w s e, n p h t u"),
    need_replication_factors=("w", "s", "e", "n", "p", "h", "t", "u"),
)


# --------------------------------------------------------------- custom VJP


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attn_core(q, k, v, bias, heads):
    if len(jax.devices()) > 1:
        return _fwd_sharded(q, k, v, bias, heads)
    return _pallas_fwd(q, k, v, bias, heads)


def _attn_fwd(q, k, v, bias, heads):
    out = _attn_core(q, k, v, bias, heads)
    return out, (q, k, v, bias, out)


def _attn_bwd(heads, res, g):
    q, k, v, bias, out = res
    if len(jax.devices()) > 1:
        return _bwd_sharded(q, k, v, bias, out, g, heads)
    return _pallas_bwd(q, k, v, bias, out, g, heads)


_attn_core.defvjp(_attn_fwd, _attn_bwd)


def fused_window_attention(
    q: jnp.ndarray,          # (B·nW, S, H·D), already scaled
    k: jnp.ndarray,          # (B·nW, S, H·D)
    v: jnp.ndarray,          # (B·nW, S, H·D)
    heads: int,
    bias: jnp.ndarray,       # (H, S, S) relative-position bias, f32
    mask: jnp.ndarray | None = None,   # (nW, S, S) additive shift mask
) -> jnp.ndarray:
    """Fused biased window attention; returns (B·nW, S, H·D) context.

    Only call when the Pallas path is live (``mha_attn._use_pallas()``) and
    ``window_attention_eligible`` — callers keep the einsum path otherwise.
    """
    bnw, s, e = q.shape
    bias = bias.astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        bias = bias[None] + mask[:, None].astype(jnp.float32)  # (nW, H, S, S)
    else:
        nw = 1
        bias = bias[None]                                      # (1, H, S, S)

    # Multi-window packing: fold P windows into one (P*S, E) tile (free
    # reshape — consecutive windows are contiguous) with a compact grouped
    # bias; the kernels compute softmax on the diagonal band only. See the
    # packing block comment above _pick_pack.
    p = _pick_pack(bnw, nw, s, e, heads, elt=jnp.dtype(q.dtype).itemsize)
    bias = _group_bias(bias, p)                  # (nWp, P, H, S, S)
    sp = p * s
    if nw > 1:
        q4, k4, v4 = (t.reshape(bnw // nw, nw // p, sp, e)
                      for t in (q, k, v))
    else:
        q4, k4, v4 = (t.reshape(bnw // p, 1, sp, e) for t in (q, k, v))
    out = _attn_core(q4, k4, v4, bias, heads)
    return out.reshape(bnw, s, e)
