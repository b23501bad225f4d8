"""Ring attention: sequence-parallel softmax attention over a mesh axis.

TPU-native long-context scaling (beyond the reference, which has no model
parallelism at all — SURVEY.md §2.8): the sequence dim of q/k/v is sharded
over a mesh axis, each device holds an (B, S/n, H·D) slice, and the exact
softmax is computed with the online (flash) recurrence while k/v slices
rotate around the ring with ``jax.lax.ppermute``. The (S, S) logits never
materialize, no device ever holds more than 1/n of the sequence, and the
kv transfers ride the ICI ring concurrently with compute (XLA overlaps the
ppermute DMA with the next block's matmuls).

Used for sequences too long for one chip's HBM/VMEM budget: ViT backbones
at very high resolution (Mask R-CNN at 1024²+ — reference
cvnets/models/detection/mask_rcnn.py builds on the classification encoder)
and long ByteFormer byte streams (reference
cvnets/models/classification/byteformer.py). ``MultiHeadAttention`` routes
here under ``--dev.sequence-parallel`` (see layers/multi_head_attention.py).

Composes with data parallelism: the shard_map splits the batch dim over
``data`` and the sequence dim over ``model``, so a (dp, sp) mesh runs each
attention block on a (B/dp, S/sp, E) tile. Differentiable end-to-end — the
kv ring is a ``lax.scan`` whose transpose rotates cotangents the opposite
way; the body is ``jax.checkpoint``-ed so the backward pass recomputes the
per-block logits instead of saving n score tiles (the same recompute trade
flash attention makes).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cvnets_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

_NEG_INF = -1e30


def _local_block(q, k, v, mask, m, l, acc, heads):
    """One kv block of the online-softmax recurrence (all f32).

    q: (B, Sq, H, D) — resident local queries, pre-scaled.
    k/v: (B, Skv, H, D) — the kv slice currently held; mask: (B, 1, 1, Skv).
    m/l/acc: running max (B, Sq, H, 1), sum (B, Sq, H, 1), context
    (B, Sq, H, D).
    """
    s = jnp.einsum("bqhd,bkhd->bqhk", q, k)            # (B, Sq, H, Skv)
    s = s + mask
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp(s - m_new)
    corr = jnp.exp(m - m_new)
    l = corr * l + jnp.sum(e, axis=-1, keepdims=True)
    acc = corr * acc + jnp.einsum("bqhk,bkhd->bqhd", e, v)
    return m_new, l, acc


def _ring_body(q, heads, axis, n, carry, _):
    k, v, mask, m, l, acc = carry
    m, l, acc = _local_block(q, k, v, mask, m, l, acc, heads)
    # rotate kv (and its key mask) one step around the ring
    perm = [(i, (i + 1) % n) for i in range(n)]
    k, v, mask = (jax.lax.ppermute(t, axis, perm) for t in (k, v, mask))
    return (k, v, mask, m, l, acc), None


def _ring_attn_local(q, k, v, mask, heads, axis, n):
    """Per-shard computation inside shard_map: q/k/v (B, S/n, H·D)."""
    b, sl, e = q.shape
    d = e // heads
    qh = q.astype(jnp.float32).reshape(b, sl, heads, d)
    kh = k.astype(jnp.float32).reshape(b, sl, heads, d)
    vh = v.astype(jnp.float32).reshape(b, sl, heads, d)
    maskh = mask.astype(jnp.float32)[:, None, None, :]   # (B, 1, 1, Skv)
    m0 = jnp.full((b, sl, heads, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, sl, heads, 1), jnp.float32)
    acc0 = jnp.zeros((b, sl, heads, d), jnp.float32)
    body = jax.checkpoint(partial(_ring_body, qh, heads, axis, n))
    (_, _, _, _, l, acc), _ = jax.lax.scan(
        body, (kh, vh, maskh, m0, l0, acc0), None, length=n)
    return (acc / l).reshape(b, sl, e).astype(q.dtype)


def sequence_shards(mesh: Mesh, axis: str = MODEL_AXIS) -> int:
    return mesh.shape.get(axis, 1)


def ring_attention_eligible(mesh: Optional[Mesh], seq: int,
                            axis: str = MODEL_AXIS) -> bool:
    """True when the mesh has a >1 ``axis`` that divides the sequence."""
    if mesh is None:
        return False
    n = mesh.shape.get(axis, 1)
    return n > 1 and seq % n == 0


def ring_attention(
    q: jnp.ndarray,              # (B, S, H·D), already scaled
    k: jnp.ndarray,              # (B, S, H·D)
    v: jnp.ndarray,              # (B, S, H·D)
    heads: int,
    mesh: Mesh,
    key_mask: Optional[jnp.ndarray] = None,   # (B, S) additive f32, 0/-inf
    seq_axis: str = MODEL_AXIS,
) -> jnp.ndarray:
    """Exact softmax attention with the sequence sharded over ``seq_axis``.

    Returns the (B, S, H·D) context with the same output sharding (batch over
    ``data`` if present, sequence over ``seq_axis``). Global arrays in, global
    arrays out — callers stay ordinary jit code; GSPMD keeps the activations
    sharded between attention blocks.
    """
    try:
        from jax import shard_map as _sm
        shard_map = partial(_sm, check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
        shard_map = partial(_sm, check_rep=False)

    b, s, e = q.shape
    n = mesh.shape[seq_axis]
    assert s % n == 0, f"sequence {s} not divisible by {seq_axis}={n}"
    assert e % heads == 0
    if key_mask is None:
        key_mask = jnp.zeros((b, s), jnp.float32)
    batch_axes = DATA_AXIS if DATA_AXIS in mesh.shape and b > 1 else None
    spec3 = P(batch_axes, seq_axis, None)
    spec2 = P(batch_axes, seq_axis)
    fn = shard_map(
        partial(_ring_attn_local, heads=heads, axis=seq_axis, n=n),
        mesh=mesh,
        in_specs=(spec3, spec3, spec3, spec2),
        out_specs=spec3,
    )
    return fn(q, k, v, key_mask)
