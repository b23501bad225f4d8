"""torch checkpoint → cvnets_tpu params converter (model-zoo compatibility).

Parity target: reference load_pretrained_model + rename/exclude scope machinery
(reference cvnets/misc/common.py:35-119). Published CVNets checkpoints are torch
``state_dict`` .pt files; this maps them onto our flax param/batch-stats pytrees:

* conv weights:  (O, I, kH, kW)  -> (kH, kW, I, O)       [NCHW -> HWIO]
* depthwise:     (O, 1, kH, kW)  -> (kH, kW, 1, O)
* linear:        (O, I)          -> (I, O)
* BN: weight/bias -> scale/bias params; running_mean/var -> batch_stats
* LN: weight/bias -> scale/bias

Name mapping is structural: both trees are flattened in module order and matched by
shape signature with a rename-regex escape hatch (``--model.rename-scopes-map``).
torch is CPU-only in this image — used purely as a .pt reader.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from cvnets_tpu.utils import logger


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        blob = blob["model_state_dict"]
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in blob.items()}


def _convert_weight(name: str, w: np.ndarray, target_shape: Tuple[int, ...]
                    ) -> Optional[np.ndarray]:
    """Try to transform a torch tensor to the target flax leaf shape."""
    if w.shape == target_shape:
        return w
    if w.ndim == 4:  # conv OIHW -> HWIO
        t = w.transpose(2, 3, 1, 0)
        if t.shape == target_shape:
            return t
        # depthwise flax layout (kH, kW, 1, O) vs torch (O, 1, kH, kW)
        t2 = w.transpose(2, 3, 1, 0)
        if t2.shape == target_shape:
            return t2
    if w.ndim == 2 and w.T.shape == target_shape:
        return w.T
    if w.ndim == 1 and target_shape == w.shape:
        return w
    return None


def _flatten(tree: Any, prefix: str = "") -> List[Tuple[str, np.ndarray]]:
    # preserve insertion order: flax params dicts are ordered by module creation,
    # which tracks definition order like torch's state_dict
    out = []
    if isinstance(tree, dict):
        for k in tree.keys():
            out.extend(_flatten(tree[k], f"{prefix}/{k}" if prefix else k))
    else:
        out.append((prefix, tree))
    return out


def _unflatten(flat: Dict[str, np.ndarray], like: Any, prefix: str = "") -> Any:
    if isinstance(like, dict):
        return {
            k: _unflatten(flat, v, f"{prefix}/{k}" if prefix else k)
            for k, v in like.items()
        }
    return flat[prefix]


def convert_torch_checkpoint(
    state_dict: Dict[str, np.ndarray],
    params: Any,
    batch_stats: Any = None,
    rename_map: Optional[List[Tuple[str, str]]] = None,
    exclude_scopes: str = "",
) -> Tuple[Any, Any, List[str]]:
    """Structurally map a torch state_dict onto (params, batch_stats).

    Matching strategy: order-preserving two-pointer walk — both frameworks enumerate
    modules in definition order, so the k-th torch conv weight corresponds to the
    k-th flax conv kernel. Shape transforms verify each match; mismatches are
    reported, not silently skipped.

    Returns (new_params, new_batch_stats, unmatched_report).
    """
    if rename_map:
        renamed = {}
        for k, v in state_dict.items():
            for pat, repl in rename_map:
                k = re.sub(pat, repl, k)
            renamed[k] = v
        state_dict = renamed
    if exclude_scopes:
        pats = [p.strip() for p in exclude_scopes.split(",") if p.strip()]
        state_dict = {
            k: v for k, v in state_dict.items()
            if not any(re.match(p, k) for p in pats)
        }

    # partition torch tensors by role, preserving order
    t_params = [(k, v) for k, v in state_dict.items()
                if not k.endswith(("running_mean", "running_var",
                                   "num_batches_tracked"))]
    t_means = [(k, v) for k, v in state_dict.items() if k.endswith("running_mean")]
    t_vars = [(k, v) for k, v in state_dict.items() if k.endswith("running_var")]

    def flax_role(name: str) -> str:
        leaf = name.rsplit("/", 1)[-1]
        if leaf in ("kernel", "weight", "scale", "pos_embed", "proj",
                    "cls_token", "token_embedding", "projection"):
            return "weight"
        if leaf in ("bias",):
            return "bias"
        return "other"

    def torch_role(name: str) -> str:
        if name.endswith(".weight") or name.endswith("weight"):
            return "weight"
        if name.endswith(".bias") or name.endswith("bias"):
            return "bias"
        return "other"

    f_params = _flatten(params)
    new_flat: Dict[str, np.ndarray] = {}
    unmatched: List[str] = []
    used = [False] * len(t_params)

    for fname, fleaf in f_params:
        target_shape = tuple(np.asarray(fleaf).shape)
        role = flax_role(fname)
        found = None
        for look, (tname, tval) in enumerate(t_params):
            if used[look]:
                continue
            t_role = torch_role(tname)
            if role != "other" and t_role != "other" and role != t_role:
                continue
            cand = _convert_weight(tname, tval, target_shape)
            if cand is not None:
                found = cand
                used[look] = True
                break
        if found is None:
            unmatched.append(f"flax:{fname} shape={target_shape}")
            new_flat[fname] = np.asarray(fleaf)
        else:
            new_flat[fname] = found.astype(np.asarray(fleaf).dtype)
    new_params = _unflatten(new_flat, params)

    new_bs = batch_stats
    if batch_stats is not None:
        f_bs = _flatten(batch_stats)
        means = [f for f in f_bs if f[0].endswith("mean")]
        vars_ = [f for f in f_bs if f[0].endswith("var")]
        bs_flat = {}
        for i, (fname, fleaf) in enumerate(means):
            bs_flat[fname] = (t_means[i][1] if i < len(t_means)
                              else np.asarray(fleaf)).astype(np.float32)
        for i, (fname, fleaf) in enumerate(vars_):
            bs_flat[fname] = (t_vars[i][1] if i < len(t_vars)
                              else np.asarray(fleaf)).astype(np.float32)
        new_bs = _unflatten(bs_flat, batch_stats)
    return new_params, new_bs, unmatched


def load_cvnets_checkpoint(opts, path: str, params: Any, batch_stats: Any = None):
    """Load a reference CVNets .pt checkpoint onto flax trees, applying the
    rename/exclude scope opts (reference model.rename_scopes_map semantics)."""
    sd = load_torch_state_dict(path)
    rename_raw = getattr(opts, "model.rename_scopes_map", None)
    rename_map = None
    if rename_raw:
        rename_map = [tuple(r.split(":", 1)) for r in rename_raw]
    exclude = getattr(opts, "model.resume_exclude_scopes", "") or ""
    new_params, new_bs, unmatched = convert_torch_checkpoint(
        sd, params, batch_stats, rename_map=rename_map, exclude_scopes=exclude,
    )
    if unmatched:
        logger.warning(
            f"{len(unmatched)} parameters not matched from {path};"
            f" first few: {unmatched[:5]}"
        )
    return new_params, new_bs
