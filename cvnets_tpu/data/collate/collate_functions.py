"""Collate functions (parity: reference data/collate_fns/collate_functions.py).

Key delta vs the reference: corrupt samples (target == -1) are *replaced by repeats of
valid samples* instead of dropped, so the batch shape stays static for XLA (dropping
would trigger a recompile per corrupt batch).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from cvnets_tpu.data.collate import COLLATE_FN_REGISTRY


def _stack_tree(batch: List[Dict]):
    first = batch[0]
    if isinstance(first, dict):
        return {k: _stack_tree([b[k] for b in batch]) for k in first}
    if isinstance(first, (int, np.integer)):
        return np.asarray(batch, dtype=np.int32)
    if isinstance(first, (float, np.floating)):
        return np.asarray(batch, dtype=np.float32)
    if isinstance(first, str):
        return list(batch)
    return np.stack([np.asarray(b) for b in batch], axis=0)


def _replace_corrupt(batch: List[Dict]) -> List[Dict]:
    def is_corrupt(item) -> bool:
        t = item.get("targets", None) if isinstance(item, dict) else None
        return isinstance(t, (int, np.integer)) and int(t) == -1

    valid = [b for b in batch if not is_corrupt(b)]
    if not valid:
        return batch  # all corrupt; let it flow (labels -1 are masked in loss)
    if len(valid) == len(batch):
        return batch
    out = list(valid)
    i = 0
    while len(out) < len(batch):
        out.append(valid[i % len(valid)])
        i += 1
    return out


@COLLATE_FN_REGISTRY.register(name="default_collate_fn")
def default_collate_fn(batch: List[Dict], opts=None) -> Dict:
    """Stack a list of {"samples", "targets", ...} dicts into batched numpy arrays."""
    batch = _replace_corrupt(batch)
    return _stack_tree(batch)


@COLLATE_FN_REGISTRY.register(name="image_classification_data_collate_fn")
def image_classification_data_collate_fn(batch: List[Dict], opts=None) -> Dict:
    return default_collate_fn(batch, opts)


@COLLATE_FN_REGISTRY.register(name="unlabeled_image_data_collate_fn")
def unlabeled_image_data_collate_fn(batch: List[Dict], opts=None) -> Dict:
    out = default_collate_fn(batch, opts)
    out.pop("targets", None)
    return out
