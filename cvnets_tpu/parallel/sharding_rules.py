"""Parameter sharding rules (GSPMD): tensor parallelism + FSDP.

The reference has data parallelism only (SURVEY.md §2.8); on TPU the same
single-program jit gives tensor parallelism and fully-sharded data parallelism
for free once parameters carry mesh-axis shardings: XLA partitions the matmuls
and inserts the all-gather/reduce-scatter collectives over ICI.

Tensor parallelism (``model`` axis) — standard Megatron-style layout without
touching any model code:

* 2-D Dense kernels: shard the OUTPUT features of expanding layers (qkv, ffn
  up-projections) and the INPUT features of contracting layers (out_proj, ffn
  down-projections) so the pair needs one collective, not two.
* 4-D conv kernels: shard output channels when divisible.
* biases/scales follow their kernel's output sharding; everything else is
  replicated.

FSDP (``data`` axis, ZeRO-3 style) — every large parameter, its Adam moments
and its EMA copy are sharded over the data axis on their largest still-free
divisible dim; XLA all-gathers the shard group just before use in fwd/bwd and
reduce-scatters the gradients, so per-device state memory drops ~linearly with
the data-axis size while the math is bit-identical to plain DP. Small leaves
(BN scales, biases under ``_FSDP_MIN_SIZE`` elements) stay replicated — the
collective latency would cost more than the bytes saved.

Activations stay batch-sharded; GSPMD propagates the rest.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cvnets_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# kernels whose INPUT dim is the sharded one (contracting / row-parallel)
_ROW_PARALLEL_TOKENS = ("out_proj", "ffn_fc2", "red_1x1", "conv_proj")

# FSDP: leaves smaller than this many elements stay replicated (per-channel
# norm scales/biases — an all-gather per step would cost more than it saves)
_FSDP_MIN_SIZE = 8192


def _model_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get(MODEL_AXIS, 1)


def _data_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get(DATA_AXIS, 1)


def _tp_spec(path, leaf, tp: int) -> List[Optional[str]]:
    """Per-dim axis assignment for the Megatron TP layout (None = free)."""
    spec: List[Optional[str]] = [None] * leaf.ndim
    if tp <= 1:
        return spec
    keys = [getattr(k, "key", str(k)) for k in path]
    name = "/".join(keys)
    leafname = keys[-1] if keys else ""
    row = any(tok in name for tok in _ROW_PARALLEL_TOKENS)
    if leafname.startswith("experts_"):
        # MoE expert stacks (modules/moe.py): (E, D, F)/(E, F, D) kernels and
        # (E, 1, F) biases — expert parallelism shards the leading E dim
        if leaf.shape[0] % tp == 0:
            spec[0] = MODEL_AXIS
        return spec
    if leafname == "kernel" and leaf.ndim == 2:
        if row and leaf.shape[0] % tp == 0:
            spec[0] = MODEL_AXIS
        elif not row and leaf.shape[1] % tp == 0:
            spec[1] = MODEL_AXIS
    elif leafname == "kernel" and leaf.ndim == 4:
        # HWIO: shard O (column-parallel) unless a contracting layer
        if row and leaf.shape[2] % tp == 0:
            spec[2] = MODEL_AXIS
        elif not row and leaf.shape[3] % tp == 0:
            spec[3] = MODEL_AXIS
    elif leafname in ("bias", "scale") and leaf.ndim == 1:
        # follow a column-parallel kernel's output sharding when divisible;
        # row-parallel outputs are replicated after the reduce
        if not row and leaf.shape[0] % tp == 0 and leaf.shape[0] >= tp * 8:
            spec[0] = MODEL_AXIS
    return spec


def _add_fsdp_axis(spec: List[Optional[str]], leaf, dp: int) -> None:
    """Shard the largest still-free dim divisible by the data-axis size."""
    if dp <= 1 or leaf.size < _FSDP_MIN_SIZE:
        return
    cand = [d for d in range(leaf.ndim)
            if spec[d] is None and leaf.shape[d] % dp == 0 and leaf.shape[d] > 1]
    if cand:
        # prefer the largest dim (fewest padding risks, biggest shards);
        # ties break toward the trailing (features/lane) dim
        spec[max(cand, key=lambda d: (leaf.shape[d], d))] = DATA_AXIS


def infer_param_sharding(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """Build a NamedSharding pytree for ``params`` over ``mesh``.

    TP rules apply when the mesh has a >1 ``model`` axis; ``fsdp=True``
    additionally shards large leaves over the ``data`` axis. Falls back to
    replication for any leaf the rules can't shard cleanly (non-divisible
    dims, scalars, small vectors).
    """
    tp = _model_axis_size(mesh)
    dp = _data_axis_size(mesh)
    repl = NamedSharding(mesh, P())

    def rule(path, leaf) -> NamedSharding:
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return repl
        spec = _tp_spec(path, leaf, tp)
        if fsdp:
            _add_fsdp_axis(spec, leaf, dp)
        if all(s is None for s in spec):
            return repl
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(rule, params)


def state_shardings(state, mesh: Mesh, fsdp: bool = False):
    """Sharding pytree matching a TrainState: params (and every params-shaped
    subtree — adam moments, EMA copy) by the TP/FSDP rules, the rest
    replicated."""
    repl = NamedSharding(mesh, P())
    param_shardings = infer_param_sharding(state.params, mesh, fsdp=fsdp)
    params_def = jax.tree_util.tree_structure(state.params)
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


def shard_state_for_tp(state, mesh: Mesh, fsdp: bool = False):
    """Place a TrainState on the mesh per ``state_shardings``."""
    return jax.device_put(state, state_shardings(state, mesh, fsdp=fsdp))


# placement covers TP, FSDP, or both — keep a mode-neutral name too
shard_train_state = shard_state_for_tp
