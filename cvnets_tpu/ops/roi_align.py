"""RoIAlign as a pure-JAX op (replaces torchvision's C++/CUDA MultiScaleRoIAlign
used by the reference Mask R-CNN, reference cvnets/models/detection/mask_rcnn.py:14).

Bilinear sampling at ``sampling_ratio²`` points per output bin, averaged — the
Detectron2/torchvision ``aligned=True`` convention.

TPU-native formulation: bilinear interpolation is separable and linear, so the
whole op is two einsums against per-roi interpolation matrices
(``out = Wx · (Wy · F)``), with the sample-point average folded into the
matrices. No gather in the forward and — crucially — no scatter in the
backward (``dF = Wyᵀ · (Wxᵀ · dout)`` is again a matmul): both passes run on
the MXU instead of the TPU's slow gather/scatter path, and the same property
makes the op ~20× faster under XLA-CPU autodiff than the advanced-indexing
version it replaced. Static shapes: N rois in, (N, out_h, out_w, C) out.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _interp_matrix(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear-interpolation weight matrix W with W[..., p, k] the weight of
    source element ``k`` for the sample at fractional position ``coords[..., p]``
    — one-hot rows at ``clip(floor(c))`` and ``clip(floor(c)+1)`` weighted
    ``1-frac`` / ``frac`` (identical edge semantics to index-clipped gathers)."""
    c0 = jnp.floor(coords)
    frac = coords - c0
    c0i = c0.astype(jnp.int32)
    lo = jnp.clip(c0i, 0, size - 1)[..., None]       # (..., P, 1)
    hi = jnp.clip(c0i + 1, 0, size - 1)[..., None]
    idx = jnp.arange(size, dtype=jnp.int32)           # (K,)
    return ((idx == lo) * (1.0 - frac)[..., None]
            + (idx == hi) * frac[..., None])          # (..., P, K)


def roi_align(
    features: jnp.ndarray,  # (H, W, C) single image feature map
    boxes: jnp.ndarray,     # (N, 4) xyxy in feature-map pixel coords
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    h, w, c = features.shape
    n = boxes.shape[0]
    oh, ow = output_size
    offset = 0.5 if aligned else 0.0

    x1, y1, x2, y2 = [boxes[:, i] for i in range(4)]
    roi_w = jnp.maximum(x2 - x1, 1e-4)
    roi_h = jnp.maximum(y2 - y1, 1e-4)
    bin_w = roi_w / ow
    bin_h = roi_h / oh

    s = sampling_ratio
    # sample grid: for output bin (i,j), sample points at fractional positions
    iy = (jnp.arange(oh)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)  # (oh, s)
    ix = (jnp.arange(ow)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)  # (ow, s)

    # absolute coords per roi: (N, oh, s)
    ys = y1[:, None, None] + iy[None] * bin_h[:, None, None] - offset
    xs = x1[:, None, None] + ix[None] * bin_w[:, None, None] - offset

    # separable bilinear + linear sample-average ⇒ fold the mean over the s
    # sample points straight into the per-roi interpolation matrices
    wy = _interp_matrix(ys, h).mean(axis=2)  # (N, oh, H)
    wx = _interp_matrix(xs, w).mean(axis=2)  # (N, ow, W)
    rows = jnp.einsum("niy,yxc->nixc", wy, features)  # (N, oh, W, C)
    return jnp.einsum("njx,nixc->nijc", wx, rows)     # (N, oh, ow, C)


def multiscale_roi_align(
    feature_maps: Sequence[jnp.ndarray],  # per-level (H_l, W_l, C), strides given
    boxes: jnp.ndarray,                   # (N, 4) xyxy in IMAGE pixel coords
    strides: Sequence[int],
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
    canonical_scale: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN level assignment (FPN paper eq. 1) + per-level RoIAlign.

    Static-shape strategy: align every roi on every level, then select by the
    assigned level mask — O(L) extra compute, no dynamic partitioning. Fine for the
    handful of FPN levels; a gather-based scatter can replace it later.
    """
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0)
    k = jnp.floor(canonical_level + jnp.log2(
        jnp.sqrt(areas) / canonical_scale + 1e-8))
    k_min = canonical_level - (len(feature_maps) - 1)
    levels = jnp.clip(k, k_min, canonical_level) - k_min  # 0..L-1

    outs = []
    for li, (fm, stride) in enumerate(zip(feature_maps, strides)):
        scaled = boxes / stride
        outs.append(roi_align(fm, scaled, output_size, sampling_ratio))
    stacked = jnp.stack(outs, axis=0)  # (L, N, oh, ow, C)
    sel = jax.nn.one_hot(levels.astype(jnp.int32), len(feature_maps),
                         dtype=stacked.dtype)  # (N, L)
    return jnp.einsum("lnhwc,nl->nhwc", stacked, sel)
