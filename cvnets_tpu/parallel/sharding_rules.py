"""Tensor-parallel parameter sharding rules (GSPMD).

The reference has data parallelism only (SURVEY.md §2.8); on TPU the same
single-program jit gives tensor parallelism for free once parameters carry a
``model``-axis sharding: XLA partitions the matmuls and inserts the
all-gather/reduce-scatter collectives over ICI. These rules implement the
standard Megatron-style layout without touching any model code:

* 2-D Dense kernels: shard the OUTPUT features of expanding layers (qkv, ffn
  up-projections) and the INPUT features of contracting layers (out_proj, ffn
  down-projections) so the pair needs one collective, not two.
* 4-D conv kernels: shard output channels when divisible.
* biases/scales follow their kernel's output sharding; everything else is
  replicated.

Activations stay batch-sharded; GSPMD propagates the rest.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cvnets_tpu.parallel.mesh import MODEL_AXIS

# kernels whose INPUT dim is the sharded one (contracting / row-parallel)
_ROW_PARALLEL_TOKENS = ("out_proj", "ffn_fc2", "red_1x1", "conv_proj")


def _model_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get(MODEL_AXIS, 1)


def infer_param_sharding(params: Any, mesh: Mesh) -> Any:
    """Build a NamedSharding pytree for ``params`` over ``mesh``.

    Falls back to replication for any leaf the rules can't shard cleanly
    (non-divisible dims, scalars, embeddings).
    """
    tp = _model_axis_size(mesh)
    repl = NamedSharding(mesh, P())

    def rule(path, leaf) -> NamedSharding:
        if tp <= 1 or not hasattr(leaf, "ndim"):
            return repl
        keys = [getattr(k, "key", str(k)) for k in path]
        name = "/".join(keys)
        leafname = keys[-1] if keys else ""
        row = any(tok in name for tok in _ROW_PARALLEL_TOKENS)
        if leafname == "kernel" and leaf.ndim == 2:
            if row and leaf.shape[0] % tp == 0:
                return NamedSharding(mesh, P(MODEL_AXIS, None))
            if not row and leaf.shape[1] % tp == 0:
                return NamedSharding(mesh, P(None, MODEL_AXIS))
            return repl
        if leafname == "kernel" and leaf.ndim == 4:
            # HWIO: shard O (column-parallel) unless a contracting layer
            if row and leaf.shape[2] % tp == 0:
                return NamedSharding(mesh, P(None, None, MODEL_AXIS, None))
            if not row and leaf.shape[3] % tp == 0:
                return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
            return repl
        if leafname in ("bias", "scale") and leaf.ndim == 1:
            # follow a column-parallel kernel's output sharding when divisible;
            # row-parallel outputs are replicated after the reduce
            if not row and leaf.shape[0] % tp == 0 and leaf.shape[0] >= tp * 8:
                return NamedSharding(mesh, P(MODEL_AXIS))
            return repl
        return repl

    return jax.tree_util.tree_map_with_path(rule, params)


def state_shardings(state, mesh: Mesh):
    """Sharding pytree matching a TrainState: params (and every params-shaped
    subtree — adam moments, EMA copy) by the TP rules, the rest replicated."""
    repl = NamedSharding(mesh, P())
    param_shardings = infer_param_sharding(state.params, mesh)
    params_def = jax.tree_util.tree_structure(state.params)
    flat_param_sh = jax.tree_util.tree_leaves(
        param_shardings, is_leaf=lambda x: isinstance(x, NamedSharding))
    flat_params = jax.tree_util.tree_leaves(state.params)
    shapes = [getattr(p, "shape", None) for p in flat_params]

    def subtree_sharding(sub):
        try:
            if jax.tree_util.tree_structure(sub) == params_def and [
                getattr(l, "shape", None)
                for l in jax.tree_util.tree_leaves(sub)
            ] == shapes:
                return param_shardings
        except Exception:
            pass
        return None

    def map_state_field(field):
        if field is None:
            return None
        sh = subtree_sharding(field)
        if sh is not None:
            return sh
        # walk one level: containers (opt_state tuples) may hold params-shaped
        # subtrees (ScaleByAdamState.mu/nu)
        return jax.tree_util.tree_map(
            lambda sub: subtree_sharding(sub) or jax.tree_util.tree_map(
                lambda _: repl, sub),
            field,
            is_leaf=lambda x: subtree_sharding(x) is not None
            or not isinstance(x, (tuple, list, dict)),
        )

    return state.replace(
        step=repl,
        params=param_shardings,
        batch_stats=jax.tree_util.tree_map(lambda _: repl, state.batch_stats),
        opt_state=map_state_field(state.opt_state),
        ema_params=(param_shardings if state.ema_params is not None else None),
        ema_batch_stats=(jax.tree_util.tree_map(
            lambda _: repl, state.ema_batch_stats)
            if getattr(state, "ema_batch_stats", None) is not None else None),
    )


def shard_state_for_tp(state, mesh: Mesh):
    """Place a TrainState on the mesh per ``state_shardings``."""
    return jax.device_put(state, state_shardings(state, mesh))
