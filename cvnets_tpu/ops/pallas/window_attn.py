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

# Disabled by default after an A/B on real v5e hardware (2026-08-18, Swin-T
# train step, batch 128 @ 224px, scan-8, value readback):
#   XLA einsum path:   844 img/s, 151.6 ms/step, 123.5 GB/step — 0.994 of its
#                      own bytes-roofline (XLA is AT speed-of-light for the
#                      bytes it moves)
#   this kernel:       641 img/s, 199.7 ms/step,  93.9 GB/step — 0.574 of its
#                      bytes-roofline
# The kernel removes 24% of step bytes (logits stay in VMEM) but executes the
# tiny (49, 49) per-window tiles at well under half the practical bandwidth —
# 49 tokens fill 38% of the 128-lane registers and the per-head D=32
# contraction uses a quarter of the MXU's k dim, so the saved HBM traffic is
# more than given back in execution inefficiency. Winning here needs
# multi-window packing (block-diagonal logits over ~8 packed windows) to fill
# the tiles; until that exists, honest eligibility is False.
# Full writeup: docs/perf/PROFILE-swin.md. Re-enable for experiments with
# CVNETS_TPU_FORCE_WINDOW_KERNEL=1.


def window_attention_eligible(seq: int, embed: int) -> bool:
    import os

    if os.environ.get("CVNETS_TPU_FORCE_WINDOW_KERNEL", "0") != "1":
        return False
    return _PALLAS_OK and seq <= _MAX_SEQ and embed <= _MAX_EMBED


# --------------------------------------------------------------- forward


def _head_softmax(q, k, bias_hi):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (S, S)
    s = s + bias_hi
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    ones = jnp.ones((e.shape[-1], 1), jnp.float32)
    l = jnp.dot(e, ones, preferred_element_type=jnp.float32)      # (S, 1)
    return e, l


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, heads: int):
    d = q_ref.shape[-1] // heads
    for hi in range(heads):
        sl = slice(hi * d, (hi + 1) * d)
        q = q_ref[0, 0, :, sl].astype(jnp.float32)      # (S, D), pre-scaled
        k = k_ref[0, 0, :, sl].astype(jnp.float32)
        v = v_ref[0, 0, :, sl].astype(jnp.float32)
        e, l = _head_softmax(q, k, bias_ref[0, hi])
        out = jnp.dot(e, v, preferred_element_type=jnp.float32) / l
        out_ref[0, 0, :, sl] = out.astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, out_in_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, heads: int):
    b = pl.program_id(1)                               # batch-inner grid dim

    @pl.when(b == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    d = q_ref.shape[-1] // heads
    for hi in range(heads):
        sl = slice(hi * d, (hi + 1) * d)
        q = q_ref[0, 0, :, sl].astype(jnp.float32)
        k = k_ref[0, 0, :, sl].astype(jnp.float32)
        v = v_ref[0, 0, :, sl].astype(jnp.float32)
        o = out_in_ref[0, 0, :, sl].astype(jnp.float32)
        do = do_ref[0, 0, :, sl].astype(jnp.float32)

        e, l = _head_softmax(q, k, bias_ref[0, hi])     # recompute
        do_n = do / l                                   # folds P = e/l scale
        dv = jax.lax.dot_general(e, do_n, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_n, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(do_n * o, axis=-1, keepdims=True)   # (S, 1)
        ds = e * (dp - delta)                           # == dL/dlogits
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, 0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, 0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0, :, sl] = dv.astype(dv_ref.dtype)
        dbias_ref[0, hi] += ds


def _qkv_spec(s: int, e: int):
    return pl.BlockSpec((1, 1, s, e), lambda w, b: (b, w, 0, 0),
                        memory_space=pltpu.VMEM)


def _bias_spec(nwb: int, heads: int, s: int):
    return pl.BlockSpec((1, heads, s, s), lambda w, b: (w % nwb, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _pallas_fwd(q, k, v, bias, heads):
    b, nw, s, e = q.shape
    nwb = bias.shape[0]
    elt = jnp.dtype(q.dtype).itemsize
    cost = pl.CostEstimate(
        flops=4 * b * nw * s * s * e,
        bytes_accessed=b * nw * s * e * elt * 4 + bias.size * 4,
        transcendentals=b * nw * heads * s * s,
    )
    return pl.pallas_call(
        partial(_fwd_kernel, heads=heads),
        cost_estimate=cost,
        interpret=_base._INTERPRET,
        grid=(nw, b),
        in_specs=[_qkv_spec(s, e)] * 3 + [_bias_spec(nwb, heads, s)],
        out_specs=_qkv_spec(s, e),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v, bias)


def _pallas_bwd(q, k, v, bias, out, do, heads):
    b, nw, s, e = q.shape
    nwb = bias.shape[0]
    elt = jnp.dtype(q.dtype).itemsize
    cost = pl.CostEstimate(
        flops=10 * b * nw * s * s * e,
        bytes_accessed=b * nw * s * e * elt * 8 + 2 * bias.size * 4,
        transcendentals=b * nw * heads * s * s,
    )
    return pl.pallas_call(
        partial(_bwd_kernel, heads=heads),
        cost_estimate=cost,
        interpret=_base._INTERPRET,
        grid=(nw, b),
        in_specs=[_qkv_spec(s, e)] * 3 + [_bias_spec(nwb, heads, s)]
        + [_qkv_spec(s, e)] * 2,
        out_specs=[_qkv_spec(s, e)] * 3 + [_bias_spec(nwb, heads, s)],
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
    bsh = NamedSharding(mesh, PartitionSpec(None, None, None, None))

    def lower(q, k, v, bias):
        return _pallas_fwd(q, k, v, bias, heads)

    return mesh, lower, qsh, (qsh, qsh, qsh, bsh)


def _part_bwd(heads, mesh, arg_infos, result_infos):
    ax = _batch_axis(arg_infos)
    qsh = NamedSharding(mesh, PartitionSpec(ax, None, None, None))
    bsh = NamedSharding(mesh, PartitionSpec(None, None, None, None))

    def lower(q, k, v, bias, out, do):
        dq, dk, dv, dbias = _pallas_bwd(q, k, v, bias, out, do, heads)
        if ax is not None:
            dbias = jax.lax.psum(dbias, ax)
        return dq, dk, dv, dbias

    return mesh, lower, (qsh, qsh, qsh, bsh), (qsh,) * 3 + (bsh, qsh, qsh)


_fwd_sharded = custom_partitioning(_pallas_fwd, static_argnums=(4,))
_fwd_sharded.def_partition(
    partition=_part_fwd,
    sharding_rule="b w s e, b w s e, b w s e, n h t u -> b w s e",
    need_replication_factors=("w", "s", "e", "n", "h", "t", "u"),
)

# NOTE: `b` is a reduction factor for dbias, but Shardy rejects a declared
# reduction factor that also appears in results (dq/dk/dv carry b), so the
# rule leaves b as passthrough; the partition callback pins dbias replicated
# and the lowering psums the per-shard partials over the batch mesh axis.
_bwd_sharded = custom_partitioning(_pallas_bwd, static_argnums=(6,))
_bwd_sharded.def_partition(
    partition=_part_bwd,
    sharding_rule=("b w s e, b w s e, b w s e, n h t u, b w s e, b w s e"
                   " -> b w s e, b w s e, b w s e, n h t u"),
    need_replication_factors=("w", "s", "e", "n", "h", "t", "u"),
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
    q4, k4, v4 = (t.reshape(bnw // nw, nw, s, e) for t in (q, k, v))
    out = _attn_core(q4, k4, v4, bias, heads)
    return out.reshape(bnw, s, e)
