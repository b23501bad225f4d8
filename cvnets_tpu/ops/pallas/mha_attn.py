"""Fused multi-head attention (flash-attention) Pallas kernel.

Replaces the einsum attention path of ``MultiHeadAttention`` (reference
algorithm: cvnets/layers/multi_head_attention.py:309 forward_default — QK^T →
softmax → ·V). On TPU the einsum form materializes the (B, H, S, S) attention
matrix in HBM and re-reads it for the softmax statistics and the context
matmul; profiled on ViT-B/16 @224 that traffic (attention matmuls at 13x off
peak, separate max/sum passes, layout copies) is ~30 ms of a 151 ms train
step.

Layout is the key design decision: the kernel consumes q/k/v exactly as the
layer's Dense projections emit them — (B, S, H·D), no head reshape, no
transpose, no sequence padding. Each grid cell owns one batch element's full
(S, H·D) tile in VMEM and loops over heads with static 64/128-lane slices;
per head it computes logits → row-stable softmax → context without the
(S, S) matrix ever reaching HBM. (A first version that transposed to
(B, H, S_pad, D) lost more to XLA pad/transpose copies — 34 ms/step — than
the fusion saved.)

The backward pass is a second Pallas kernel using the flash-attention
recomputation trick (rebuilds the exp tile from q/k in VMEM; only the forward
output is saved for the softmax-backward rowsum), with the softmax division
folded into dO:

    dP = (dO/l)·V^T,  dS = E ∘ (dP − rowsum((dO/l) ∘ O)),  dQ = dS·K,
    dK = dS^T·Q,  dV = E^T·(dO/l)

Key-padding masks enter as one additive f32 (B, 1, S) mask on the logits.
VMEM bounds eligibility for the single-tile kernel: sequences past
``_MAX_SEQ`` (Mask R-CNN ViT backbones at 1024², long ByteFormer configs)
route to the KV-blocked online-softmax kernel in ``mha_attn_long.py``; only
shapes neither kernel can tile fall back to the XLA einsum path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_NEG_INF = -1e30
# (S, S) f32 logits + (S, H·D) q/k/v/o tiles must fit VMEM (~16 MB)
_MAX_SEQ = 512
_MAX_EMBED = 1024
# test hook: run the Pallas kernels in interpreter mode on CPU
_INTERPRET = False


def _use_pallas() -> bool:
    return _PALLAS_OK and (jax.default_backend() == "tpu" or _INTERPRET)


def _head_exp(q, k, mask_row):
    """One head: masked logits → row-stable exp(s − max) and row sums (MXU).

    The normalizing division is deferred to the (S, D) context — dividing the
    (S, S) tile costs S/D times more VPU ops for the same result; the row sum
    rides the MXU (e @ 1) instead of a cross-lane reduction."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (S, S)
    s = s + mask_row                                   # (1, S) broadcast
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    ones = jnp.ones((e.shape[-1], 1), jnp.float32)
    l = jnp.dot(e, ones, preferred_element_type=jnp.float32)      # (S, 1)
    return e, l


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, heads: int):
    """One batch element: all heads, full sequence, in VMEM."""
    d = q_ref.shape[-1] // heads
    mask_row = mask_ref[0]                              # (1, S)
    for hi in range(heads):
        sl = slice(hi * d, (hi + 1) * d)
        q = q_ref[0, :, sl].astype(jnp.float32)         # (S, D), pre-scaled
        k = k_ref[0, :, sl].astype(jnp.float32)
        v = v_ref[0, :, sl].astype(jnp.float32)
        e, l = _head_exp(q, k, mask_row)
        out = jnp.dot(e, v, preferred_element_type=jnp.float32) / l
        out_ref[0, :, sl] = out.astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, out_in_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, heads: int):
    d = q_ref.shape[-1] // heads
    mask_row = mask_ref[0]
    for hi in range(heads):
        sl = slice(hi * d, (hi + 1) * d)
        q = q_ref[0, :, sl].astype(jnp.float32)
        k = k_ref[0, :, sl].astype(jnp.float32)
        v = v_ref[0, :, sl].astype(jnp.float32)
        o = out_in_ref[0, :, sl].astype(jnp.float32)
        do = do_ref[0, :, sl].astype(jnp.float32)

        e, l = _head_exp(q, k, mask_row)                # recompute
        do_n = do / l                                   # folds P = e/l scale
        dv = jax.lax.dot_general(e, do_n, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_n, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(do_n * o, axis=-1, keepdims=True)   # (S, 1)
        ds = e * (dp - delta)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _qkv_spec(s: int, e: int):
    # full (S, H·D) tile per batch element — the natural layer layout
    return pl.BlockSpec((1, s, e), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _mask_spec(s: int):
    return pl.BlockSpec((1, 1, s), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _pallas_fwd(q, k, v, mask, heads):
    b, s, e = q.shape
    elt = jnp.dtype(q.dtype).itemsize
    cost = pl.CostEstimate(
        flops=4 * b * s * s * e,
        bytes_accessed=b * s * e * elt * 4 + b * s * 4,
        transcendentals=b * heads * s * s,
    )
    return pl.pallas_call(
        partial(_fwd_kernel, heads=heads),
        cost_estimate=cost,
        interpret=_INTERPRET,
        grid=(b,),
        in_specs=[_qkv_spec(s, e)] * 3 + [_mask_spec(s)],
        out_specs=_qkv_spec(s, e),
        out_shape=jax.ShapeDtypeStruct((b, s, e), q.dtype),
    )(q, k, v, mask)


def _pallas_bwd(q, k, v, mask, out, do, heads):
    b, s, e = q.shape
    elt = jnp.dtype(q.dtype).itemsize
    cost = pl.CostEstimate(
        flops=10 * b * s * s * e,
        bytes_accessed=b * s * e * elt * 8 + b * s * 4,
        transcendentals=b * heads * s * s,
    )
    return pl.pallas_call(
        partial(_bwd_kernel, heads=heads),
        cost_estimate=cost,
        interpret=_INTERPRET,
        grid=(b,),
        in_specs=[_qkv_spec(s, e)] * 3 + [_mask_spec(s)]
        + [_qkv_spec(s, e)] * 2,
        out_specs=[_qkv_spec(s, e)] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, s, e), q.dtype)] * 3,
    )(q, k, v, mask, out, do)


# --- GSPMD partitioning -----------------------------------------------------
# A bare pallas_call is an opaque custom call to GSPMD: with a batch-sharded
# input it inserts an all-gather and runs the kernel replicated (measured on
# an 8-device mesh). custom_partitioning declares the batch dim shardable and
# S/E replicated, so each device runs the kernel on its local batch shard —
# the data-parallel train step stays collective-free through attention.


def _batch_axis(arg_infos):
    spec = arg_infos[0].sharding.spec
    return spec[0] if len(spec) else None


def _sharded_fwd_partition(heads, mesh, arg_infos, result_infos):
    sh = NamedSharding(mesh, PartitionSpec(_batch_axis(arg_infos), None, None))

    def lower(q, k, v, mask):
        return _pallas_fwd(q, k, v, mask, heads)

    return mesh, lower, sh, (sh, sh, sh, sh)


def _sharded_bwd_partition(heads, mesh, arg_infos, result_infos):
    sh = NamedSharding(mesh, PartitionSpec(_batch_axis(arg_infos), None, None))

    def lower(q, k, v, mask, out, do):
        return _pallas_bwd(q, k, v, mask, out, do, heads)

    return mesh, lower, (sh, sh, sh), (sh,) * 6


_fwd_sharded = custom_partitioning(_pallas_fwd, static_argnums=(4,))
_fwd_sharded.def_partition(
    partition=_sharded_fwd_partition,
    sharding_rule="b s e, b s e, b s e, b u s -> b s e",
    need_replication_factors=("s", "e", "u"),
)

_bwd_sharded = custom_partitioning(_pallas_bwd, static_argnums=(6,))
_bwd_sharded.def_partition(
    partition=_sharded_bwd_partition,
    sharding_rule=("b s e, b s e, b s e, b u s, b s e, b s e"
                   " -> b s e, b s e, b s e"),
    need_replication_factors=("s", "e", "u"),
)


def _split_heads(x, heads):
    b, s, e = x.shape
    return x.reshape(b, s, heads, e // heads)


def _reference(q, k, v, mask, heads):
    """XLA einsum form (identical math, off-TPU / over-budget path)."""
    qh, kh, vh = (_split_heads(t.astype(jnp.float32), heads)
                  for t in (q, k, v))
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) + mask[:, :, None, :]
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
    return out.reshape(q.shape).astype(q.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attn_core(q, k, v, mask, heads):
    if _use_pallas():
        # custom_partitioning resolves its partition callback at compile
        # time, which remote-compile relays (axon) cannot serve — route
        # through it only when >1 device makes partitioning meaningful
        if len(jax.devices()) > 1:
            return _fwd_sharded(q, k, v, mask, heads)
        return _pallas_fwd(q, k, v, mask, heads)
    return _reference(q, k, v, mask, heads)


def _attn_fwd(q, k, v, mask, heads):
    out = _attn_core(q, k, v, mask, heads)
    return out, (q, k, v, mask, out)


def _attn_bwd(heads, res, g):
    q, k, v, mask, out = res
    if _use_pallas():
        if len(jax.devices()) > 1:
            dq, dk, dv = _bwd_sharded(q, k, v, mask, out, g, heads)
        else:
            dq, dk, dv = _pallas_bwd(q, k, v, mask, out, g, heads)
        return dq, dk, dv, None
    # XLA fallback: identical flash-style backward in einsum form
    qh, kh, vh, gh, oh = (_split_heads(t.astype(jnp.float32), heads)
                          for t in (q, k, v, g, out))
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) + mask[:, :, None, :]
    p = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gh)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gh, vh)
    delta = jnp.sum(gh * oh, axis=-1)                   # (B, S, H)
    ds = p * (dp - delta.transpose(0, 2, 1)[..., None])
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kh)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qh)
    return (dq.reshape(q.shape).astype(q.dtype),
            dk.reshape(k.shape).astype(k.dtype),
            dv.reshape(v.shape).astype(v.dtype), None)


_attn_core.defvjp(_attn_fwd, _attn_bwd)


def fused_attention_eligible(seq: int, embed: int) -> bool:
    """True when a Pallas attention kernel can tile the shape: either the
    single-tile kernel (S ≤ ``_MAX_SEQ``) or the KV-blocked long-sequence
    kernel (S divisible by a block that fits VMEM)."""
    if seq <= _MAX_SEQ and embed <= _MAX_EMBED:
        return True
    from cvnets_tpu.ops.pallas import mha_attn_long

    return mha_attn_long.long_attention_eligible(seq, embed)


def fused_mha_attention(
    q: jnp.ndarray,              # (B, S, H·D), already scaled
    k: jnp.ndarray,              # (B, S, H·D)
    v: jnp.ndarray,              # (B, S, H·D)
    heads: int,
    key_mask: Optional[jnp.ndarray] = None,   # (B, S) additive f32, 0/-inf
) -> jnp.ndarray:
    """Fused softmax attention; returns (B, S, H·D) context."""
    b, s, e = q.shape
    if key_mask is None:
        mask = jnp.zeros((b, 1, s), jnp.float32)
    else:
        mask = key_mask.astype(jnp.float32).reshape(b, 1, s)
    if s > _MAX_SEQ and _use_pallas():
        from cvnets_tpu.ops.pallas import mha_attn_long

        if mha_attn_long.long_attention_eligible(
                s, e, jnp.dtype(q.dtype).itemsize):
            return mha_attn_long.attn_core_long(q, k, v, mask, heads)
    return _attn_core(q, k, v, mask, heads)
