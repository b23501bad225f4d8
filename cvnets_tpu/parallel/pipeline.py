"""Pipeline parallelism: GPipe microbatch pipelining over a mesh axis.

TPU-native model parallelism beyond the reference (which is replicated DDP
only — SURVEY.md §2.8): a stack of L homogeneous blocks (ViT/ByteFormer
transformer encoders, reference cvnets/models/classification/vit.py builds
exactly such a stack) is split into P stages of L/P blocks, the stacked
block parameters are sharded over the mesh's ``pipe`` axis, and M
microbatches stream through the stages. Activations hop stage→stage with
``jax.lax.ppermute`` (one ICI neighbor transfer per tick, riding the ring),
so no device ever holds more than L/P blocks' parameters or one
microbatch's activations.

Schedule: GPipe — T = M + P - 1 ticks; at tick t, stage p runs microbatch
``t - p``. Stage 0 injects fresh microbatches, the last stage emits
finished ones; the (P-1)-tick fill/drain bubble is the usual GPipe cost
(amortized by M >> P). The whole schedule is one ``lax.scan`` under
``shard_map``, so it is a single XLA program and **differentiable**: the
transpose of the scan runs the ticks backward and the transpose of each
``ppermute`` rotates cotangents the opposite way — the classic backward
pipeline falls out of JAX AD instead of being hand-scheduled. Each tick's
block stack is ``jax.checkpoint``-ed: the backward pass recomputes a
stage's activations rather than storing every (tick, stage) tensor.

Composes with data parallelism: on a ``(data, pipe)`` mesh the batch dim
shards over ``data`` while stages split over ``pipe`` — each pipeline
instance sees its local batch shard, and XLA's implicit gradient psum over
``data`` is unchanged. Numerics are exactly the sequential model's (same
blocks, same order, f32 loss matches to 1e-4 — tests/test_pipeline.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def stack_block_params(params_list):
    """Stack per-block param pytrees into one pytree with a leading block dim.

    The leading dim (L) is what shards over the ``pipe`` axis; block i's
    params live at leaf[i]. Blocks must be homogeneous (identical treedef +
    leaf shapes), which holds for transformer encoder stacks.
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def _run_stage(block_fn, params_local, h):
    """Apply this stage's L/P blocks sequentially to activation h."""

    def body(carry, p):
        return block_fn(p, carry), None

    out, _ = jax.lax.scan(body, h, params_local)
    return out


def _pipeline_local(stacked_local, x_mb, block_fn, axis, n_stages, n_micro):
    """Per-device GPipe schedule inside shard_map.

    stacked_local: [L/P, ...] pytree — this stage's blocks.
    x_mb: [M, mbs, ...] — all microbatches (replicated; only stage 0 reads).
    Returns [M, mbs, ...] finished activations (valid on every device — the
    last stage's buffer is broadcast with a masked psum at the end).
    """
    stage = jax.lax.axis_index(axis)
    ticks = n_micro + n_stages - 1
    state = jnp.zeros_like(x_mb[0])
    out_buf = jnp.zeros_like(x_mb)
    fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(carry, t):
        state, out_buf = carry
        # receive the previous stage's activation (stage 0 receives nothing:
        # the perm has no edge into 0, ppermute fills it with zeros)
        state = jax.lax.ppermute(state, axis, fwd_perm)
        # stage 0 injects microbatch t while t < M
        inject = jnp.logical_and(stage == 0, t < n_micro)
        mb = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, n_micro - 1), axis=0, keepdims=False)
        state = jnp.where(inject, mb, state)
        state = jax.checkpoint(partial(_run_stage, block_fn))(
            stacked_local, state)
        # the last stage finished microbatch t-(P-1); park it in the buffer
        o = t - (n_stages - 1)
        emit = jnp.logical_and(stage == n_stages - 1, o >= 0)
        oc = jnp.clip(o, 0, n_micro - 1)
        cur = jax.lax.dynamic_index_in_dim(out_buf, oc, axis=0,
                                           keepdims=False)
        out_buf = jax.lax.dynamic_update_index_in_dim(
            out_buf, jnp.where(emit, state, cur), oc, axis=0)
        return (state, out_buf), None

    (_, out_buf), _ = jax.lax.scan(tick, (state, out_buf),
                                   jnp.arange(ticks))
    # broadcast the last stage's buffer to every device (masked psum) so the
    # caller's replicated head/loss sees the finished activations everywhere.
    mask = (stage == n_stages - 1).astype(out_buf.dtype)
    return jax.lax.psum(out_buf * mask, axis)


def pipeline_blocks(
    stacked_params: Any,            # pytree, leading dim L (num blocks)
    x: jnp.ndarray,                 # (B, ...) activations entering block 0
    block_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    mesh: Mesh,
    num_microbatches: Optional[int] = None,
    pipe_axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Run ``x`` through L stacked blocks pipelined over ``pipe_axis``.

    Global arrays in, global arrays out: callers stay ordinary jit code.
    ``block_fn(params_i, h) -> h`` applies one block (e.g. a flax
    TransformerEncoder ``apply``); all blocks must share one param treedef
    and activation shape. B must divide into ``num_microbatches`` (default:
    the pipe-axis size, the minimum that fills the pipeline).
    """
    try:
        from jax import shard_map as _sm
        shard_map = partial(_sm, check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
        shard_map = partial(_sm, check_rep=False)

    n_stages = mesh.shape[pipe_axis]
    n_micro = num_microbatches or n_stages
    b = x.shape[0]
    lead = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert lead % n_stages == 0, (
        f"{lead} blocks not divisible into {n_stages} pipeline stages")
    assert b % n_micro == 0, f"batch {b} not divisible by M={n_micro}"
    if data_axis is not None and data_axis in mesh.shape:
        assert b % (n_micro * mesh.shape[data_axis]) == 0
    # (M, mbs, ...) microbatch view; batch may additionally shard over data
    x_mb = x.reshape(n_micro, b // n_micro, *x.shape[1:])
    dspec = data_axis if data_axis is not None and data_axis in mesh.shape \
        else None
    x_spec = P(None, dspec, *([None] * (x.ndim - 1)))
    param_specs = jax.tree_util.tree_map(
        lambda p: P(pipe_axis, *([None] * (p.ndim - 1))), stacked_params)
    fn = shard_map(
        partial(_pipeline_local, block_fn=block_fn, axis=pipe_axis,
                n_stages=n_stages, n_micro=n_micro),
        mesh=mesh,
        in_specs=(param_specs, x_spec),
        out_specs=x_spec,
    )
    y_mb = fn(stacked_params, x_mb)
    return y_mb.reshape(b, *x.shape[1:])
