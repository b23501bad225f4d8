"""KV-blocked (online-softmax) flash attention for long sequences.

Extends the single-tile fused MHA kernel (``mha_attn.py``) past its
``_MAX_SEQ = 512`` VMEM bound. Consumers (reference parity targets):
Mask R-CNN with a ViT backbone at 1024^2 inputs (S = 4096 patch tokens,
reference cvnets/models/detection/mask_rcnn.py builds on the classification
encoder), and long ByteFormer configs (reference
cvnets/models/classification/byteformer.py — byte sequences reach several
thousand tokens after the conv downsampler). Both previously fell back to
the XLA einsum path, which materializes the (B, H, S, S) attention matrix
in HBM: at S = 4096, H = 12 that is 800 MB of f32 traffic per direction per
layer — the dominant cost of the step.

Same layout contract as the single-tile kernel: q/k/v arrive as the layer's
Dense projections emit them — (B, S, H·D), q pre-scaled, no head transpose.
The grid blocks the sequence dim: forward runs (B, n_q, n_kv) with the kv
dim innermost, carrying running max/sum/context in VMEM scratch (the
standard online-softmax recurrence); only the (B, S, H·D) output and a
(B, S, H) logsumexp ever reach HBM.

Backward is the standard two-kernel flash split (dq accumulates over kv
blocks, dk/dv over q blocks — a single kernel would revisit an HBM output
block non-consecutively, which the sequential TPU grid cannot do):

    p  = exp(s − lse)            (recomputed per tile from q, k in VMEM)
    dv += pᵀ·dO                  dp = dO·Vᵀ
    ds = p ∘ (dp − delta)        delta_i = Σ_d dO_id · O_id  (XLA precompute)
    dq += ds·K                   dk += dsᵀ·Q

Masking follows the single-tile kernel's contract: one additive f32
(B, 1, S) key mask; a fully-masked row degrades to uniform attention
exactly like the XLA path with a −1e30 additive mask.
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

_NEG_INF = -1e30
_MAX_EMBED = 1024
# VMEM budget for one grid cell (resident q/out/acc + double-buffered k/v
# streams + the (Bq, Bkv) exp tile); half of the ~16 MB arena, leaving the
# rest to the pipeline.
_VMEM_BUDGET = 8 * 1024 * 1024


def choose_block(seq: int, embed: int, itemsize: int) -> int | None:
    """Largest of 512/256/128 that divides ``seq`` and fits the budget."""
    for blk in (512, 256, 128):
        if seq % blk:
            continue
        # q + out resident, k + v double-buffered, f32 acc, f32 exp tile
        need = (2 * blk * embed * itemsize + 4 * blk * embed * itemsize
                + 4 * blk * embed + 8 * blk * blk)
        if need <= _VMEM_BUDGET:
            return blk
    return None


def long_attention_eligible(seq: int, embed: int, itemsize: int = 4) -> bool:
    return embed <= _MAX_EMBED and choose_block(seq, embed, itemsize) is not None


# --------------------------------------------------------------- forward


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, heads: int, n_kv: int):
    """Grid (b, qi, ki), ki innermost: online-softmax over kv blocks."""
    ki = pl.program_id(2)
    d = q_ref.shape[-1] // heads

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mask_row = mask_ref[0]                              # (1, Bkv)
    ones = jnp.ones((k_ref.shape[1], 1), jnp.float32)
    for hi in range(heads):
        sl = slice(hi * d, (hi + 1) * d)
        hs = slice(hi, hi + 1)
        q = q_ref[0, :, sl].astype(jnp.float32)         # (Bq, D), pre-scaled
        k = k_ref[0, :, sl].astype(jnp.float32)         # (Bkv, D)
        v = v_ref[0, :, sl].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + mask_row
        m_old = m_ref[:, hs]                            # (Bq, 1)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp(s - m_new)
        corr = jnp.exp(m_old - m_new)                   # (Bq, 1)
        l_ref[:, hs] = corr * l_ref[:, hs] + jnp.dot(
            e, ones, preferred_element_type=jnp.float32)
        m_ref[:, hs] = m_new
        acc_ref[:, sl] = corr * acc_ref[:, sl] + jnp.dot(
            e, v, preferred_element_type=jnp.float32)

    @pl.when(ki == n_kv - 1)
    def _flush():
        for hi in range(heads):
            sl = slice(hi * d, (hi + 1) * d)
            hs = slice(hi, hi + 1)
            l = l_ref[:, hs]                            # (Bq, 1)
            out_ref[0, :, sl] = (acc_ref[:, sl] / l).astype(out_ref.dtype)
            lse_ref[0, :, hs] = m_ref[:, hs] + jnp.log(l)


def _qkv_spec(blk: int, e: int, which: str):
    idx = {"q": lambda b, qi, ki: (b, qi, 0),
           "kv": lambda b, qi, ki: (b, ki, 0)}[which]
    return pl.BlockSpec((1, blk, e), idx, memory_space=pltpu.VMEM)


def _mask_spec(blk: int):
    return pl.BlockSpec((1, 1, blk), lambda b, qi, ki: (b, 0, ki),
                        memory_space=pltpu.VMEM)


def _rowstat_spec(blk: int, heads: int):
    # (B, S, H) arrays (lse / delta) blocked over the q rows
    return pl.BlockSpec((1, blk, heads), lambda b, qi, ki: (b, qi, 0),
                        memory_space=pltpu.VMEM)


def _pallas_fwd(q, k, v, mask, heads):
    b, s, e = q.shape
    blk = choose_block(s, e, jnp.dtype(q.dtype).itemsize)
    n = s // blk
    elt = jnp.dtype(q.dtype).itemsize
    cost = pl.CostEstimate(
        flops=4 * b * s * s * e,
        bytes_accessed=b * s * e * elt * (3 * n + 1) + b * s * 4,
        transcendentals=b * heads * s * s,
    )
    return pl.pallas_call(
        partial(_fwd_kernel, heads=heads, n_kv=n),
        cost_estimate=cost,
        interpret=_base._INTERPRET,
        grid=(b, n, n),
        in_specs=[_qkv_spec(blk, e, "q")] + [_qkv_spec(blk, e, "kv")] * 2
        + [_mask_spec(blk)],
        out_specs=[_qkv_spec(blk, e, "q"), _rowstat_spec(blk, heads)],
        out_shape=[jax.ShapeDtypeStruct((b, s, e), q.dtype),
                   jax.ShapeDtypeStruct((b, s, heads), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((blk, e), jnp.float32),
                        pltpu.VMEM((blk, heads), jnp.float32),
                        pltpu.VMEM((blk, heads), jnp.float32)],
    )(q, k, v, mask)


# --------------------------------------------------------------- backward


def _p_ds(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref, hi, d):
    """Recompute the (Bq, Bkv) probability tile and its cotangent ds."""
    sl = slice(hi * d, (hi + 1) * d)
    hs = slice(hi, hi + 1)
    q = q_ref[0, :, sl].astype(jnp.float32)
    k = k_ref[0, :, sl].astype(jnp.float32)
    v = v_ref[0, :, sl].astype(jnp.float32)
    do = do_ref[0, :, sl].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + mask_ref[0]
    p = jnp.exp(s - lse_ref[0, :, hs])                  # (Bq, Bkv)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, :, hs])
    return p, ds, q, k, do, sl


def _dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_acc, *, heads: int, n_kv: int):
    """Grid (b, qi, ki), ki innermost: dq = Σ_ki ds·K."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    d = q_ref.shape[-1] // heads
    for hi in range(heads):
        _, ds, _, k, _, sl = _p_ds(q_ref, k_ref, v_ref, mask_ref, do_ref,
                                   lse_ref, delta_ref, hi, d)
        dq_acc[:, sl] += jnp.dot(ds, k, preferred_element_type=jnp.float32)

    @pl.when(ki == n_kv - 1)
    def _flush():
        dq_ref[...] = dq_acc[...].astype(dq_ref.dtype)[None]


def _dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, heads: int, n_q: int):
    """Grid (b, ki, qi), qi innermost: dk = Σ_qi dsᵀ·Q, dv = Σ_qi pᵀ·dO."""
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    d = q_ref.shape[-1] // heads
    for hi in range(heads):
        p, ds, q, _, do, sl = _p_ds(q_ref, k_ref, v_ref, mask_ref, do_ref,
                                    lse_ref, delta_ref, hi, d)
        dk_acc[:, sl] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv_acc[:, sl] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qi == n_q - 1)
    def _flush():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)[None]
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)[None]


def _bwd_in_specs(blk, e, heads, which_rows):
    """The 7 shared backward inputs; q/do/lse/delta follow ``which_rows``."""
    rows = "q" if which_rows == "q_inner_kv" else "kv_as_rows"
    if which_rows == "q_inner_kv":      # grid (b, qi, ki)
        qs = _qkv_spec(blk, e, "q")
        kv = _qkv_spec(blk, e, "kv")
        mk = _mask_spec(blk)
        rs = _rowstat_spec(blk, heads)
    else:                               # grid (b, ki, qi): swap roles
        qs = pl.BlockSpec((1, blk, e), lambda b, ki, qi: (b, qi, 0),
                          memory_space=pltpu.VMEM)
        kv = pl.BlockSpec((1, blk, e), lambda b, ki, qi: (b, ki, 0),
                          memory_space=pltpu.VMEM)
        mk = pl.BlockSpec((1, 1, blk), lambda b, ki, qi: (b, 0, ki),
                          memory_space=pltpu.VMEM)
        rs = pl.BlockSpec((1, blk, heads), lambda b, ki, qi: (b, qi, 0),
                          memory_space=pltpu.VMEM)
    del rows
    return [qs, kv, kv, mk, qs, rs, rs]


def _pallas_dq(q, k, v, mask, do, lse, delta, heads):
    b, s, e = q.shape
    blk = choose_block(s, e, jnp.dtype(q.dtype).itemsize)
    n = s // blk
    elt = jnp.dtype(q.dtype).itemsize
    cost = pl.CostEstimate(
        flops=6 * b * s * s * e,
        bytes_accessed=b * s * e * elt * (4 * n + 1),
        transcendentals=b * heads * s * s,
    )
    return pl.pallas_call(
        partial(_dq_kernel, heads=heads, n_kv=n),
        cost_estimate=cost,
        interpret=_base._INTERPRET,
        grid=(b, n, n),
        in_specs=_bwd_in_specs(blk, e, heads, "q_inner_kv"),
        out_specs=_qkv_spec(blk, e, "q"),
        out_shape=jax.ShapeDtypeStruct((b, s, e), q.dtype),
        scratch_shapes=[pltpu.VMEM((blk, e), jnp.float32)],
    )(q, k, v, mask, do, lse, delta)


def _pallas_dkv(q, k, v, mask, do, lse, delta, heads):
    b, s, e = q.shape
    blk = choose_block(s, e, jnp.dtype(q.dtype).itemsize)
    n = s // blk
    elt = jnp.dtype(q.dtype).itemsize
    kvspec = pl.BlockSpec((1, blk, e), lambda b, ki, qi: (b, ki, 0),
                          memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=8 * b * s * s * e,
        bytes_accessed=b * s * e * elt * (4 * n + 2),
        transcendentals=b * heads * s * s,
    )
    return pl.pallas_call(
        partial(_dkv_kernel, heads=heads, n_q=n),
        cost_estimate=cost,
        interpret=_base._INTERPRET,
        grid=(b, n, n),
        in_specs=_bwd_in_specs(blk, e, heads, "kv_inner_q"),
        out_specs=[kvspec, kvspec],
        out_shape=[jax.ShapeDtypeStruct((b, s, e), q.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((blk, e), jnp.float32)] * 2,
    )(q, k, v, mask, do, lse, delta)


# --------------------------------------------------- GSPMD partitioning
# Same rationale as mha_attn.py: declare the batch dim shardable so a
# data-parallel step runs the kernel on local shards with no all-gather.


def _batch_axis(arg_infos):
    spec = arg_infos[0].sharding.spec
    return spec[0] if len(spec) else None


def _part_fwd(heads, mesh, arg_infos, result_infos):
    sh = NamedSharding(mesh, PartitionSpec(_batch_axis(arg_infos), None, None))

    def lower(q, k, v, mask):
        return _pallas_fwd(q, k, v, mask, heads)

    return mesh, lower, (sh, sh), (sh,) * 4


def _part_dq(heads, mesh, arg_infos, result_infos):
    sh = NamedSharding(mesh, PartitionSpec(_batch_axis(arg_infos), None, None))

    def lower(*args):
        return _pallas_dq(*args, heads)

    return mesh, lower, sh, (sh,) * 7


def _part_dkv(heads, mesh, arg_infos, result_infos):
    sh = NamedSharding(mesh, PartitionSpec(_batch_axis(arg_infos), None, None))

    def lower(*args):
        return _pallas_dkv(*args, heads)

    return mesh, lower, (sh, sh), (sh,) * 7


_fwd_sharded = custom_partitioning(_pallas_fwd, static_argnums=(4,))
_fwd_sharded.def_partition(
    partition=_part_fwd,
    sharding_rule="b s e, b s e, b s e, b u s -> b s e, b s h",
    need_replication_factors=("s", "e", "u", "h"),
)

_BWD_IN_RULE = "b s e, b s e, b s e, b u s, b s e, b s h, b s h"
_dq_sharded = custom_partitioning(_pallas_dq, static_argnums=(7,))
_dq_sharded.def_partition(
    partition=_part_dq,
    sharding_rule=f"{_BWD_IN_RULE} -> b s e",
    need_replication_factors=("s", "e", "u", "h"),
)
_dkv_sharded = custom_partitioning(_pallas_dkv, static_argnums=(7,))
_dkv_sharded.def_partition(
    partition=_part_dkv,
    sharding_rule=f"{_BWD_IN_RULE} -> b s e, b s e",
    need_replication_factors=("s", "e", "u", "h"),
)


def _multi_device() -> bool:
    return len(jax.devices()) > 1


# --------------------------------------------------------------- custom VJP


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def attn_core_long(q, k, v, mask, heads):
    """Blocked flash attention; only reached when the Pallas path is live
    (``fused_mha_attention`` falls back to the einsum reference otherwise)."""
    out, _ = (_fwd_sharded if _multi_device() else _pallas_fwd)(
        q, k, v, mask, heads)
    return out


def _long_fwd(q, k, v, mask, heads):
    out, lse = (_fwd_sharded if _multi_device() else _pallas_fwd)(
        q, k, v, mask, heads)
    return out, (q, k, v, mask, out, lse)


def _long_bwd(heads, res, g):
    q, k, v, mask, out, lse = res
    b, s, e = q.shape
    d = e // heads
    # delta_i = Σ_d dO·O per head — one XLA elementwise+reduce pass, O(S·E)
    # traffic, negligible next to the O(S²) tiles it saves recomputing.
    delta = (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
        b, s, heads, d).sum(-1)
    args = (q, k, v, mask, g, lse, delta)
    if _multi_device():
        dq = _dq_sharded(*args, heads)
        dk, dv = _dkv_sharded(*args, heads)
    else:
        dq = _pallas_dq(*args, heads)
        dk, dv = _pallas_dkv(*args, heads)
    return dq, dk, dv, None


attn_core_long.defvjp(_long_fwd, _long_bwd)
