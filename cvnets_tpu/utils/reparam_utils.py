"""Branch re-parameterization for MobileOne/FastViT/RepLK blocks.

Parity: reference cvnets/modules/mobileone_block.py reparameterize/
get_exportable_model — at inference the parallel train-time branches
(k×k convs + 1×1 scale + identity BN) fold into ONE conv with bias:

    W_fused = Σ_b  γ_b/σ_b · pad(W_b)          b over branches
    b_fused = Σ_b  β_b − γ_b μ_b / σ_b

where (γ, β, μ, σ²) are each branch's BN params/stats, the 1×1 kernel pads to
k×k center, and the identity branch is a centered identity kernel.

Works on flax param/batch-stats subtrees (HWIO kernels) host-side with numpy;
the result loads into the ``inference_mode=True`` model variant.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _fuse_conv_bn(kernel: np.ndarray, bn: Dict, bn_stats: Dict,
                  eps: float = 1e-5) -> Tuple[np.ndarray, np.ndarray]:
    """(HWIO kernel, BN params/stats) -> (fused kernel, fused bias)."""
    gamma = np.asarray(bn["scale"], np.float64)
    beta = np.asarray(bn["bias"], np.float64)
    mean = np.asarray(bn_stats["mean"], np.float64)
    var = np.asarray(bn_stats["var"], np.float64)
    std = np.sqrt(var + eps)
    t = gamma / std  # (O,)
    fused_k = np.asarray(kernel, np.float64) * t  # broadcast over O (last axis)
    fused_b = beta - mean * t
    return fused_k, fused_b


def _pad_to_k(kernel: np.ndarray, k: int) -> np.ndarray:
    """Zero-pad a (kh, kw, I, O) kernel to (k, k, I, O), centered."""
    kh, kw = kernel.shape[:2]
    ph, pw = (k - kh) // 2, (k - kw) // 2
    return np.pad(kernel, ((ph, k - kh - ph), (pw, k - kw - pw), (0, 0), (0, 0)))


def _identity_kernel(k: int, in_per_group: int, out_ch: int) -> np.ndarray:
    """Centered identity (kh, kw, I/g, O) kernel for the BN skip branch."""
    ker = np.zeros((k, k, in_per_group, out_ch))
    for o in range(out_ch):
        ker[k // 2, k // 2, o % in_per_group, o] = 1.0
    return ker


def reparameterize_mobileone_block(
    block_params: Dict, block_stats: Dict, kernel_size: int,
    has_identity: bool, num_conv_branches: int, use_scale_branch: bool = True,
    eps: float = 1e-5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold a MobileOneBlock's branches into (reparam_kernel, reparam_bias).

    The flax layout has branches named ``conv_branch_<i>/{conv,norm}``,
    ``scale_branch/{conv,norm}``, ``skip_bn``.
    """
    fused_k = None
    fused_b = None

    def add(kk, bb):
        nonlocal fused_k, fused_b
        fused_k = kk if fused_k is None else fused_k + kk
        fused_b = bb if fused_b is None else fused_b + bb

    for i in range(num_conv_branches):
        br = f"conv_branch_{i}"
        kk, bb = _fuse_conv_bn(block_params[br]["conv"]["kernel"],
                               block_params[br]["norm"],
                               block_stats[br]["norm"], eps)
        add(kk, bb)
    if use_scale_branch and kernel_size > 1 and "scale_branch" in block_params:
        kk, bb = _fuse_conv_bn(block_params["scale_branch"]["conv"]["kernel"],
                               block_params["scale_branch"]["norm"],
                               block_stats["scale_branch"]["norm"], eps)
        add(_pad_to_k(kk, kernel_size), bb)
    if has_identity and "skip_bn" in block_params:
        ref = fused_k
        in_per_group, out_ch = ref.shape[2], ref.shape[3]
        ident = _identity_kernel(kernel_size, in_per_group, out_ch)
        kk, bb = _fuse_conv_bn(ident, block_params["skip_bn"],
                               block_stats["skip_bn"], eps)
        add(kk, bb)
    return fused_k.astype(np.float32), fused_b.astype(np.float32)


def get_exportable_params(params: Any, batch_stats: Any) -> Dict:
    """Walk a model tree and fold every MobileOneBlock/RepLK-style subtree into
    reparam_conv weights for the ``inference_mode=True`` model.

    Heuristic: a dict containing ``conv_branch_0`` is a MobileOneBlock; one with
    ``lk_conv`` is a RepLKBlock.
    """

    def walk(p: Dict, s: Dict) -> Dict:
        if not isinstance(p, dict):
            return p
        if "conv_branch_0" in p or ("skip_bn" in p and "scale_branch" in p):
            n_branches = len([k for k in p if k.startswith("conv_branch_")])
            ref_branch = p.get("conv_branch_0") or p.get("scale_branch")
            k = np.asarray(ref_branch["conv"]["kernel"]).shape[0] \
                if "conv_branch_0" in p else 1
            kk, bb = reparameterize_mobileone_block(
                p, s, kernel_size=k, has_identity="skip_bn" in p,
                num_conv_branches=n_branches,
            )
            out = {"reparam_conv": {"conv": {"kernel": kk, "bias": bb}}}
            # keep non-branch children (e.g. se)
            for key in p:
                if not (key.startswith("conv_branch_") or key in
                        ("scale_branch", "skip_bn")):
                    out[key] = walk(p[key], s.get(key, {}) if isinstance(s, dict)
                                    else {})
            return out
        if "lk_conv" in p:
            kk, bb = _fuse_conv_bn(p["lk_conv"]["conv"]["kernel"],
                                   p["lk_conv"]["norm"], s["lk_conv"]["norm"])
            if "sk_conv" in p:
                k = kk.shape[0]
                kk2, bb2 = _fuse_conv_bn(p["sk_conv"]["conv"]["kernel"],
                                         p["sk_conv"]["norm"], s["sk_conv"]["norm"])
                kk = kk + _pad_to_k(kk2, k)
                bb = bb + bb2
            return {"reparam_conv": {"conv": {"kernel": kk.astype(np.float32),
                                              "bias": bb.astype(np.float32)}}}
        return {key: walk(p[key], s.get(key, {}) if isinstance(s, dict) else {})
                for key in p}

    return walk(params, batch_stats if isinstance(batch_stats, dict) else {})
