"""Box coordinate utilities (parity: reference cvnets/misc/box_utils.py, 118 LoC).

Pure jnp/numpy-compatible functions: corner-form [x1,y1,x2,y2] ↔ center-form
[cx,cy,w,h], SSD offset encode/decode with center/size variances, IoU matrices.
Work on both numpy (host-side matching in the data pipeline) and jnp (device).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

Arr = Union[np.ndarray, jnp.ndarray]


def corner_to_center(boxes: Arr) -> Arr:
    xy = (boxes[..., :2] + boxes[..., 2:]) * 0.5
    wh = boxes[..., 2:] - boxes[..., :2]
    xp = jnp if isinstance(boxes, jnp.ndarray) else np
    return xp.concatenate([xy, wh], axis=-1)


def center_to_corner(boxes: Arr) -> Arr:
    tl = boxes[..., :2] - boxes[..., 2:] * 0.5
    br = boxes[..., :2] + boxes[..., 2:] * 0.5
    xp = jnp if isinstance(boxes, jnp.ndarray) else np
    return xp.concatenate([tl, br], axis=-1)


def convert_boxes_to_locations(gt_center: Arr, prior_center: Arr,
                               center_variance: float = 0.1,
                               size_variance: float = 0.2) -> Arr:
    """Encode center-form gt boxes as SSD regression targets vs priors."""
    xp = jnp if isinstance(gt_center, jnp.ndarray) else np
    eps = 1e-8
    d_xy = (gt_center[..., :2] - prior_center[..., :2]) / (
        prior_center[..., 2:] + eps
    ) / center_variance
    d_wh = xp.log(xp.maximum(gt_center[..., 2:], eps)
                  / xp.maximum(prior_center[..., 2:], eps)) / size_variance
    return xp.concatenate([d_xy, d_wh], axis=-1)


def convert_locations_to_boxes(locations: Arr, prior_center: Arr,
                               center_variance: float = 0.1,
                               size_variance: float = 0.2) -> Arr:
    """Decode SSD regression outputs back to center-form boxes."""
    xp = jnp if isinstance(locations, jnp.ndarray) else np
    xy = locations[..., :2] * center_variance * prior_center[..., 2:] \
        + prior_center[..., :2]
    wh = xp.exp(locations[..., 2:] * size_variance) * prior_center[..., 2:]
    return xp.concatenate([xy, wh], axis=-1)


def box_area(boxes: Arr) -> Arr:
    return (boxes[..., 2] - boxes[..., 0]).clip(0) * (
        boxes[..., 3] - boxes[..., 1]
    ).clip(0)


def box_iou(boxes_a: Arr, boxes_b: Arr, eps: float = 1e-7) -> Arr:
    """Pairwise IoU of corner-form boxes: (N,4) × (M,4) -> (N,M)."""
    xp = jnp if isinstance(boxes_a, jnp.ndarray) else np
    tl = xp.maximum(boxes_a[..., :, None, :2], boxes_b[..., None, :, :2])
    br = xp.minimum(boxes_a[..., :, None, 2:], boxes_b[..., None, :, 2:])
    wh = (br - tl).clip(0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes_a)[..., :, None] + box_area(boxes_b)[..., None, :] - inter
    return inter / (union + eps)
