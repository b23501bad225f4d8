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

ORDER INVARIANT: the structural walk requires the flax dicts in module-DEFINITION
order, which eager ``model.init`` produces but any jit boundary destroys (jax
sorts dict keys at every pytree level). Params that crossed a jit boundary must
be re-created via ``engine.train_state.jit_init_ordered`` (what
``create_train_state`` uses) before feeding them here.
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


def _convert_weight(flax_name: str, w: np.ndarray, target_shape: Tuple[int, ...]
                    ) -> Optional[np.ndarray]:
    """Transform a torch tensor to the target flax leaf shape.

    The transform is decided by the *flax leaf name*, never by shape luck: a
    flax ``kernel`` always demands the torch→flax layout transpose (OIHW→HWIO
    for conv, (out,in)→(in,out) for linear) even when the raw shape happens to
    match already (square layers would otherwise load transposed — advisor
    finding r1#1). Shape fallback applies only to non-kernel leaves.
    """
    leaf = flax_name.rsplit("/", 1)[-1]
    if leaf == "kernel":
        if w.ndim == 4:
            if len(target_shape) == 2 and w.shape[2:] == (1, 1):
                # reference implements some projections as 1x1 convs (e.g. the
                # MobileViTv2 separable-attention qkv) where we use a Dense
                t = w[:, :, 0, 0].T
                return t if t.shape == target_shape else None
            # conv OIHW -> HWIO (depthwise (O,1,kH,kW) -> (kH,kW,1,O) too)
            t = w.transpose(2, 3, 1, 0)
            return t if t.shape == target_shape else None
        if w.ndim == 2:  # linear (out, in) -> (in, out)
            t = w.T
            return t if t.shape == target_shape else None
        if w.ndim == 3:  # conv1d OIW -> WIO
            t = w.transpose(2, 1, 0)
            return t if t.shape == target_shape else None
        if w.ndim == 5:  # conv3d OIDHW -> DHWIO
            t = w.transpose(2, 3, 4, 1, 0)
            return t if t.shape == target_shape else None
        return None
    # non-kernel leaves (bias/scale/embedding tables/pos-embeds/...): exact shape
    if w.shape == target_shape:
        return w
    # embeddings or projection tables stored transposed
    if w.ndim == 2 and w.T.shape == target_shape:
        return w.T
    # squeeze-compatible shapes (e.g. torch layer_scale (C,1,1) -> flax (C,))
    if tuple(s for s in w.shape if s != 1) == tuple(
        s for s in target_shape if s != 1
    ) and np.prod(w.shape, dtype=np.int64) == np.prod(
        target_shape, dtype=np.int64
    ):
        return w.reshape(target_shape)
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

    # partition torch tensors by role, preserving order; non-learnable buffers
    # (BN counters, swin relative_position_index / attn_mask) are recomputed on
    # our side and must not participate in the order walk
    t_params = [(k, v) for k, v in state_dict.items()
                if not k.endswith(("running_mean", "running_var",
                                   "num_batches_tracked",
                                   "relative_position_index", "attn_mask"))]
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

    # Pre-pass: distinctive singleton tensors (pos_embed, cls_token, ...) can sit at
    # different positions in the two enumerations (torch registers buffers/params in
    # __init__ order, flax in first-use order). When a token identifies exactly one
    # tensor on each side, pair them by name before the order-based walk.
    # entries are (flax_substring, torch_substring); matched leaf lists must
    # have equal length and are zipped in enumeration order
    DISTINCTIVE = (
        ("pos_embed",) * 2, ("cls_token",) * 2, ("logit_scale",) * 2,
        ("class_embedding",) * 2, ("post_transformer_norm",) * 2,
        ("relative_position_bias_table",) * 2, ("reduction",) * 2,
        # SE units: torch declares them before the branch convs in some blocks
        # (FastViT MobileOneBlock), flax materializes them at call time
        ("/se/", ".se."),
        # CLIP text projection: torch registers projection_layer in __init__
        # order (before the transformer stack), flax at end-of-call
        ("text_encoder/projection", "text_encoder.projection_layer"),
        # ByteFormer downsamplers: torch groups them in a ModuleDict after the
        # block ModuleList; flax interleaves them with the blocks (both sides
        # enumerate downsample_3, _7, _11 in the same numeric order)
        ("downsample_", "downsamplers.downsample_"),
    )
    pre_matched_f: set = set()
    pre_matched_t: set = set()
    for f_token, t_token in DISTINCTIVE:
        f_hits = [i for i, (n, _) in enumerate(f_params) if f_token in n]
        t_hits = [i for i, (n, _) in enumerate(t_params) if t_token in n]
        if not f_hits or len(f_hits) != len(t_hits):
            continue
        for fi, ti in zip(f_hits, t_hits):
            fname, fleaf = f_params[fi]
            tname, tval = t_params[ti]
            target_shape = tuple(np.asarray(fleaf).shape)
            cand = _convert_weight(fname, tval, target_shape)
            if cand is None and np.prod(tval.shape, dtype=np.int64) == np.prod(
                target_shape, dtype=np.int64
            ):
                cand = tval.reshape(target_shape)
            if cand is not None:
                new_flat[fname] = cand.astype(np.asarray(fleaf).dtype)
                pre_matched_f.add(fi)
                pre_matched_t.add(ti)
    if pre_matched_f:
        f_params = [f for i, f in enumerate(f_params) if i not in pre_matched_f]
        t_params = [t for i, t in enumerate(t_params) if i not in pre_matched_t]

    # True two-pointer walk (advisor finding r1#2): both frameworks enumerate
    # modules in definition order, so the pointer over torch tensors only ever
    # advances. A bounded lookahead tolerates torch-only tensors (e.g. buffers
    # we do not model); a miss inside the window is reported as a desync
    # instead of silently grabbing an earlier same-shaped tensor.
    LOOKAHEAD = 8
    ptr = 0
    skipped_torch: List[str] = []
    for fname, fleaf in f_params:
        target_shape = tuple(np.asarray(fleaf).shape)
        role = flax_role(fname)
        found = None
        found_at = None
        for off in range(LOOKAHEAD):
            idx = ptr + off
            if idx >= len(t_params):
                break
            tname, tval = t_params[idx]
            t_role = torch_role(tname)
            if role != "other" and t_role != "other" and role != t_role:
                continue
            cand = _convert_weight(fname, tval, target_shape)
            if cand is not None:
                found = cand
                found_at = idx
                break
        if found is None:
            unmatched.append(f"flax:{fname} shape={target_shape} (desync at torch#{ptr})")
            new_flat[fname] = np.asarray(fleaf)
        else:
            skipped_torch.extend(t_params[i][0] for i in range(ptr, found_at))
            new_flat[fname] = found.astype(np.asarray(fleaf).dtype)
            ptr = found_at + 1
    unmatched.extend(f"torch:{n} (skipped)" for n in skipped_torch)
    unmatched.extend(f"torch:{n} (trailing)" for n, _ in t_params[ptr:])
    new_params = _unflatten(new_flat, params)

    new_bs = batch_stats
    if batch_stats is not None:
        f_bs = _flatten(batch_stats)
        means = [f for f in f_bs if f[0].endswith("mean")]
        vars_ = [f for f in f_bs if f[0].endswith("var")]
        bs_flat = {}
        for role_name, flax_side, torch_side in (
            ("running_mean", means, t_means),
            ("running_var", vars_, t_vars),
        ):
            for i, (fname, fleaf) in enumerate(flax_side):
                fallback = np.asarray(fleaf)
                if i < len(torch_side):
                    tname, tval = torch_side[i]
                    if tuple(tval.shape) != tuple(fallback.shape):
                        unmatched.append(
                            f"batch_stats desync: flax:{fname} {fallback.shape}"
                            f" vs torch:{tname} {tuple(tval.shape)}"
                        )
                        bs_flat[fname] = fallback.astype(np.float32)
                    else:
                        bs_flat[fname] = tval.astype(np.float32)
                else:
                    unmatched.append(f"batch_stats missing torch {role_name} for {fname}")
                    bs_flat[fname] = fallback.astype(np.float32)
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
