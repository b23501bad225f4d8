"""Fused Pallas kernel for MobileViTv2 separable self-attention (the BASELINE
north-star kernel; reference algorithm: cvnets/layers/linear_attention.py:134-161).

The core — softmax over the token axis on 1-dim query scores, context reduction,
relu(value)·context — is fused into ONE VMEM-resident kernel per (batch·patch)
tile: a single HBM read of q/k/v and a single write of the output, instead of the
4+ elementwise/reduce kernels XLA would emit. Backward is a hand-derived VJP in
plain XLA ops (cheap elementwise/reduce), wired via jax.custom_vjp.

Shapes: q (BP, N, 1), k/v (BP, N, C) where BP = batch·patch_area, N tokens, C dims.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _attn_kernel(q_ref, k_ref, v_ref, out_ref):
    """One (N, C) tile: fused softmax → context → relu·context."""
    q = q_ref[0].astype(jnp.float32)          # (N, 1)
    k = k_ref[0].astype(jnp.float32)          # (N, C)
    v = v_ref[0].astype(jnp.float32)          # (N, C)
    # numerically-stable softmax over tokens (axis 0)
    m = jnp.max(q, axis=0, keepdims=True)
    e = jnp.exp(q - m)
    s = e / jnp.sum(e, axis=0, keepdims=True)  # (N, 1)
    ctx = jnp.sum(k * s, axis=0, keepdims=True)  # (1, C)
    out = jnp.maximum(v, 0.0) * ctx
    out_ref[0] = out.astype(out_ref.dtype)


def _pallas_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    bp, n, c = k.shape
    elt = jnp.dtype(v.dtype).itemsize
    cost = pl.CostEstimate(
        flops=bp * n * c * 4,  # mul+add for context, relu+mul for output
        bytes_accessed=bp * (n * 1 + 3 * n * c) * elt,
        transcendentals=bp * n,  # exp in softmax
    )
    return pl.pallas_call(
        _attn_kernel,
        cost_estimate=cost,
        grid=(bp,),
        in_specs=[
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n, c), v.dtype),
    )(q, k, v)


def _reference_forward(q, k, v):
    s = jax.nn.softmax(q.astype(jnp.float32), axis=1).astype(q.dtype)
    ctx = jnp.sum(k * s, axis=1, keepdims=True)
    return jnp.maximum(v, 0) * ctx


# A bare pallas_call is an opaque custom call to GSPMD: with a batch-sharded
# input it inserts an all-gather and runs replicated. custom_partitioning
# declares the (batch·patch) dim shardable and N/C replicated so each device
# runs the kernel on its local shard (see mha_attn.py for the measurement).
def _sharded_partition(mesh, arg_infos, result_infos):
    from jax.sharding import NamedSharding, PartitionSpec

    spec = arg_infos[0].sharding.spec
    bax = spec[0] if len(spec) else None
    sh = NamedSharding(mesh, PartitionSpec(bax, None, None))
    return mesh, _pallas_forward, sh, (sh, sh, sh)


try:
    from jax.experimental.custom_partitioning import custom_partitioning

    _pallas_forward_sharded = custom_partitioning(_pallas_forward)
    _pallas_forward_sharded.def_partition(
        partition=_sharded_partition,
        sharding_rule="p n o, p n c, p n c -> p n c",
        need_replication_factors=("n", "c", "o"),
    )
except Exception:  # pragma: no cover
    _pallas_forward_sharded = _pallas_forward


@jax.custom_vjp
def separable_attention_core(q: jnp.ndarray, k: jnp.ndarray,
                             v: jnp.ndarray) -> jnp.ndarray:
    """Fused separable attention core; falls back to XLA off-TPU."""
    if _PALLAS_OK and jax.default_backend() == "tpu":
        # see mha_attn.py: cp's compile-time callback cannot cross the
        # remote-compile relay; single-device needs no partitioning anyway
        if len(jax.devices()) > 1:
            return _pallas_forward_sharded(q, k, v)
        return _pallas_forward(q, k, v)
    return _reference_forward(q, k, v)


def _fwd(q, k, v):
    out = separable_attention_core(q, k, v)
    return out, (q, k, v)


def _bwd(res, g):
    q, k, v = res
    g = g.astype(jnp.float32)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    s = jax.nn.softmax(qf, axis=1)                       # (BP, N, 1)
    ctx = jnp.sum(kf * s, axis=1, keepdims=True)         # (BP, 1, C)
    relu_v = jnp.maximum(vf, 0.0)
    dv = g * ctx * (vf > 0)
    dctx = jnp.sum(g * relu_v, axis=1, keepdims=True)    # (BP, 1, C)
    dk = s * dctx                                        # broadcast over N
    ds = jnp.sum(dctx * kf, axis=-1, keepdims=True)      # (BP, N, 1)
    dq = s * (ds - jnp.sum(s * ds, axis=1, keepdims=True))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


separable_attention_core.defvjp(_fwd, _bwd)


def separable_attention_bphw(q: jnp.ndarray, k: jnp.ndarray,
                             v: jnp.ndarray) -> jnp.ndarray:
    """(B, P, N, ·) convenience wrapper used by LinearSelfAttention."""
    b, p, n, c = v.shape
    out = separable_attention_core(
        q.reshape(b * p, n, 1), k.reshape(b * p, n, c), v.reshape(b * p, n, c)
    )
    return out.reshape(b, p, n, c)
