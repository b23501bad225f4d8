"""Checkpoint save/load with the reference's file-role semantics.

Parity: reference utils/checkpoint_utils.py:94-407 —
* ``training_checkpoint_last`` : full training state {iterations, epoch, params,
  batch_stats, opt_state, best_metric, ema} for auto-resume,
* ``checkpoint_best`` / ``checkpoint_last`` (+ ``_ema`` variants): eval params only,
* k-best score-named checkpoints and their fp64 parameter average ``checkpoint_avg``,
* optional per-epoch and every-N-updates interval checkpoints.

Implemented on orbax PyTreeCheckpointer; paths are directories rather than ``.pt``
files. On multi-host, only process 0 drives the save (orbax handles the rest).
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from cvnets_tpu.utils import logger

CHECKPOINT_EXTN = "ckpt"


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    _checkpointer().save(path, _to_host(tree))


def load_pytree(path: str, target: Any = None) -> Any:
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path)
    if target is not None:
        # restore dtypes/structure of target
        flat_t, treedef = jax.tree_util.tree_flatten(target)
        flat_r = jax.tree_util.tree_leaves(restored)
        if len(flat_t) == len(flat_r):
            flat = [
                np.asarray(r).astype(t.dtype) if hasattr(t, "dtype") else r
                for t, r in zip(flat_t, flat_r)
            ]
            return jax.tree_util.tree_unflatten(treedef, flat)
    return restored


def average_ckpt_trees(trees: List[Any]) -> Any:
    """fp64 parameter averaging (reference avg_and_save_k_checkpoints :62-91)."""
    def avg(*leaves):
        acc = np.zeros_like(np.asarray(leaves[0], dtype=np.float64))
        for leaf in leaves:
            acc += np.asarray(leaf, dtype=np.float64)
        acc /= len(leaves)
        return acc.astype(np.asarray(leaves[0]).dtype)

    return jax.tree_util.tree_map(avg, *trees)


class CheckpointManager:
    def __init__(self, opts, save_dir: str, is_master_node: bool = True) -> None:
        self.opts = opts
        self.save_dir = save_dir
        self.is_master_node = is_master_node
        self.k_best = getattr(opts, "common.k_best_checkpoints", 5) or 0
        self.save_all = getattr(opts, "common.save_all_checkpoints", False)
        self.max_metric = getattr(opts, "stats.checkpoint_metric_max", False)
        self.ckpt_metric = getattr(opts, "stats.checkpoint_metric", "loss")
        self.best_metric: float = -float("inf") if self.max_metric else float("inf")
        self.k_best_scores: List[Tuple[float, str]] = []
        os.makedirs(save_dir, exist_ok=True)

    def _p(self, name: str) -> str:
        return os.path.join(self.save_dir, f"{name}.{CHECKPOINT_EXTN}")

    def is_best(self, metric: float) -> bool:
        return metric >= self.best_metric if self.max_metric else metric <= self.best_metric

    def save(self, state, epoch: int, iterations: int, ckpt_metric: float) -> None:
        """Epoch-end checkpoint cycle (reference save_checkpoint :230-329)."""
        if not self.is_master_node:
            return
        # settle best BEFORE serializing the resume state: otherwise a run
        # resumed after its best epoch restores a stale best_metric and
        # re-overwrites checkpoint_best with a worse model (advisor r1#3)
        new_best = self.is_best(ckpt_metric)
        if new_best:
            self.best_metric = ckpt_metric

        # full training state for auto-resume
        save_pytree(self._p("training_checkpoint_last"), {
            "epoch": np.asarray(epoch),
            "iterations": np.asarray(iterations),
            "best_metric": np.asarray(self.best_metric if np.isfinite(self.best_metric)
                                      else ckpt_metric),
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params if state.ema_params is not None else {},
            "ema_batch_stats": (getattr(state, "ema_batch_stats", None) or {}),
        })
        save_pytree(self._p("checkpoint_last"), {"params": state.params,
                                                 "batch_stats": state.batch_stats})
        ema_bs = getattr(state, "ema_batch_stats", None)
        if ema_bs is None:
            ema_bs = state.batch_stats
        if state.ema_params is not None:
            save_pytree(self._p("checkpoint_ema_last"),
                        {"params": state.ema_params, "batch_stats": ema_bs})

        if new_best:
            save_pytree(self._p("checkpoint_best"),
                        {"params": state.params, "batch_stats": state.batch_stats})
            if state.ema_params is not None:
                save_pytree(self._p("checkpoint_ema_best"),
                            {"params": state.ema_params,
                             "batch_stats": ema_bs})

        if self.save_all:
            save_pytree(self._p(f"checkpoint_epoch_{epoch}"),
                        {"params": state.params, "batch_stats": state.batch_stats})

        if self.k_best > 0:
            self._update_k_best(state, ckpt_metric, epoch)

    def _update_k_best(self, state, metric: float, epoch: int = 0) -> None:
        """Keep k score-named checkpoints + their average (reference :94-154).

        Names carry the epoch so equal (4-decimal) scores cannot collide and
        delete a still-listed checkpoint (advisor r1#3)."""
        name = f"checkpoint_score_{metric:.4f}_ep{epoch}"
        save_pytree(self._p(name), {"params": state.params,
                                    "batch_stats": state.batch_stats})
        self.k_best_scores.append((metric, self._p(name)))
        self.k_best_scores.sort(key=lambda t: t[0], reverse=self.max_metric)
        while len(self.k_best_scores) > self.k_best:
            _, drop = self.k_best_scores.pop()
            if os.path.exists(drop):
                shutil.rmtree(drop, ignore_errors=True)
        if len(self.k_best_scores) >= 2:
            trees = [load_pytree(p)["params"] for _, p in self.k_best_scores]
            avg = average_ckpt_trees(trees)
            save_pytree(self._p("checkpoint_avg"),
                        {"params": avg, "batch_stats": state.batch_stats})

    def save_interval(self, state, iterations: int) -> None:
        """Every-N-updates checkpoint (reference :157-188)."""
        if not self.is_master_node:
            return
        save_pytree(self._p(f"checkpoint_iter_{iterations}"),
                    {"params": state.params, "batch_stats": state.batch_stats})


def load_checkpoint(opts, state, save_dir: str):
    """Auto-resume from training_checkpoint_last (reference load_checkpoint :332-407).

    Returns (state, start_epoch, iterations, best_metric) — state unchanged if no
    checkpoint exists.
    """
    resume_loc = getattr(opts, "common.resume", None)
    auto_resume = getattr(opts, "common.auto_resume", False)
    path = None
    if resume_loc:
        path = resume_loc
    elif auto_resume:
        candidate = os.path.join(save_dir, f"training_checkpoint_last.{CHECKPOINT_EXTN}")
        if os.path.isdir(candidate):
            path = candidate
    if path is None:
        return state, 0, 0, None
    blob = load_pytree(path)
    target_ema = state.ema_params

    def cast_like(target, restored):
        if target is None or not restored:
            return target
        return jax.tree_util.tree_map(
            lambda t, r: np.asarray(r).astype(t.dtype), target, restored
        )

    state = state.replace(
        params=cast_like(state.params, blob["params"]),
        batch_stats=cast_like(state.batch_stats, blob.get("batch_stats", {})),
        opt_state=jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state.opt_state),
            jax.tree_util.tree_leaves(blob["opt_state"]),
        ) if "opt_state" in blob else state.opt_state,
        ema_params=cast_like(target_ema, blob.get("ema_params")) if target_ema is not None else None,
        ema_batch_stats=(cast_like(getattr(state, "ema_batch_stats", None),
                                   blob.get("ema_batch_stats"))
                         if getattr(state, "ema_batch_stats", None) is not None
                         else None),
        step=np.asarray(blob.get("iterations", 0), np.int32),
    )
    epoch = int(blob.get("epoch", -1)) + 1
    iterations = int(blob.get("iterations", 0))
    best = float(blob.get("best_metric")) if blob.get("best_metric") is not None else None
    logger.info(f"Resumed from {path}: epoch {epoch}, iteration {iterations}")
    return state, epoch, iterations, best


def _flatten_dict(tree, prefix="") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(_flatten_dict(v, key))
        else:
            out[key] = v
    return out


def _merge_with_scopes(dst: Dict, src_flat: Dict[str, Any], opts,
                       prefix: str = "") -> Tuple[Dict, List[str]]:
    """Overlay flat ``src`` onto nested ``dst`` honoring the reference's finetune
    scope surgery (cvnets/misc/common.py:54-109): ``--model.rename-scopes-map``
    rewrites source keys, ``--model.resume-exclude-scopes`` keeps the fresh init
    for matching keys, ``--model.ignore-missing-scopes`` silences keys the
    checkpoint doesn't provide. Returns (merged, missing_unignored)."""
    import re

    rename_raw = (getattr(opts, "model.rename_scopes_map", None) or []) if opts else []
    renames = []
    for item in rename_raw:
        if isinstance(item, (list, tuple)) and len(item) == 2:
            renames.append((item[0], item[1]))
        elif isinstance(item, str) and ":" in item:
            pat, rep = item.split(":", 1)
            renames.append((pat, rep))
    if renames:
        src_flat = {
            _apply_renames(k, renames): v for k, v in src_flat.items()
        }
    exclude = (getattr(opts, "model.resume_exclude_scopes", "") or "") if opts else ""
    ignore = (getattr(opts, "model.ignore_missing_scopes", "") or "") if opts else ""
    exclude_res = [re.compile(p.strip()) for p in exclude.split(",") if p.strip()]
    ignore_res = [re.compile(p.strip()) for p in ignore.split(",") if p.strip()]

    missing: List[str] = []

    def merge(node, pfx):
        out = {}
        for k, v in node.items():
            key = f"{pfx}.{k}" if pfx else k
            if isinstance(v, dict):
                out[k] = merge(v, key)
                continue
            if any(r.search(key) for r in exclude_res):
                out[k] = v  # excluded: keep fresh init
                continue
            if key in src_flat:
                arr = np.asarray(src_flat[key])
                if tuple(arr.shape) != tuple(np.shape(v)):
                    # e.g. classifier head with a different n_classes: keep the
                    # fresh init (reference requires excluding such scopes)
                    logger.warning(
                        f"Shape mismatch for '{key}': ckpt {arr.shape} vs model"
                        f" {np.shape(v)}; keeping fresh init")
                    out[k] = v
                else:
                    out[k] = arr.astype(v.dtype)
            else:
                out[k] = v
                if not any(r.search(key) for r in ignore_res):
                    missing.append(key)
        return out

    return merge(dst, prefix), missing


def _apply_renames(key: str, renames) -> str:
    import re

    for pat, rep in renames:
        key = re.sub(pat, rep, key)
    return key


def load_model_weights(path: str, params, batch_stats=None, opts=None):
    """Load params-only checkpoint (finetune path) with regex scope surgery."""
    blob = load_pytree(path)
    src = blob.get("params", blob)
    new_params, missing = _merge_with_scopes(params, _flatten_dict(src), opts)
    if missing:
        logger.warning(
            f"Finetune checkpoint missing {len(missing)} parameter(s); keeping"
            f" fresh init for e.g. {missing[:3]} (silence with"
            " --model.ignore-missing-scopes)")
    new_bs = batch_stats
    if batch_stats is not None and blob.get("batch_stats"):
        new_bs, _ = _merge_with_scopes(
            batch_stats, _flatten_dict(blob["batch_stats"]), opts)
    return new_params, new_bs
