"""RoIAlign as a pure-JAX op (replaces torchvision's C++/CUDA MultiScaleRoIAlign
used by the reference Mask R-CNN, reference cvnets/models/detection/mask_rcnn.py:14).

Bilinear sampling at ``sampling_ratio²`` points per output bin, averaged — the
Detectron2/torchvision ``aligned=True`` convention. Gathers vectorize over
(rois, out_h, out_w, samples); XLA lowers them to TPU gather ops. Static shapes:
N rois in, (N, out_h, out_w, C) out.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


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

    def bilinear(yy, xx):
        """yy: (N, oh, s), xx: (N, ow, s) -> (N, oh, s, ow, s, C)"""
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        wy1 = yy - y0
        wx1 = xx - x0

        def gather(yi, xi):
            yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            # broadcast to (N, oh, s, ow, s)
            Y = yi[:, :, :, None, None]
            X = xi[:, None, None, :, :]
            return features[Y, X]  # (N, oh, s, ow, s, C)

        v00 = gather(y0, x0)
        v01 = gather(y0, x0 + 1)
        v10 = gather(y0 + 1, x0)
        v11 = gather(y0 + 1, x0 + 1)
        wy1b = wy1[:, :, :, None, None, None]
        wx1b = wx1[:, None, None, :, :, None]
        return (v00 * (1 - wy1b) * (1 - wx1b) + v01 * (1 - wy1b) * wx1b
                + v10 * wy1b * (1 - wx1b) + v11 * wy1b * wx1b)

    samples = bilinear(ys, xs)  # (N, oh, s, ow, s, C)
    return samples.mean(axis=(2, 4))  # (N, oh, ow, C)


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
