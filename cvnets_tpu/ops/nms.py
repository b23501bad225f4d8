"""Padded, jit-compatible NMS (replaces torchvision's C++ batched_nms used by the
reference SSD postprocess, reference cvnets/models/detection/ssd.py:480).

Static shapes throughout: input is a fixed number of candidate boxes, output is a
fixed ``max_output`` set of (box, score, index) with invalid slots scored -1.
``batched_nms`` uses the class-offset trick — boxes of different classes are shifted
to disjoint coordinate ranges so one NMS pass handles all classes.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from cvnets_tpu.ops.box_utils import box_iou


@partial(jax.jit, static_argnames=("max_output",))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float = 0.5,
        max_output: int = 100) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over corner-form boxes.

    Returns (keep_indices[max_output], keep_scores[max_output]); empty slots have
    index -1 and score -inf. O(max_output · N) with an N×1 IoU row per step —
    XLA-friendly (no dynamic shapes).
    """
    n = boxes.shape[0]

    def body(carry, _):
        active_scores, = carry
        best = jnp.argmax(active_scores)
        best_score = active_scores[best]
        best_box = boxes[best]
        ious = box_iou(best_box[None], boxes)[0]
        suppress = ious > iou_threshold
        new_scores = jnp.where(suppress, -jnp.inf, active_scores)
        new_scores = new_scores.at[best].set(-jnp.inf)
        valid = best_score > -jnp.inf
        return (new_scores,), (jnp.where(valid, best, -1),
                               jnp.where(valid, best_score, -jnp.inf))

    (_,), (idxs, kept_scores) = jax.lax.scan(
        body, (scores,), None, length=max_output
    )
    return idxs, kept_scores


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, class_ids: jnp.ndarray,
                iou_threshold: float = 0.5, max_output: int = 100
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS via the coordinate-offset trick (torchvision semantics)."""
    max_coord = jnp.max(boxes) + 1.0
    offsets = class_ids.astype(boxes.dtype)[:, None] * max_coord
    shifted = boxes + offsets
    return nms(shifted, scores, iou_threshold=iou_threshold, max_output=max_output)
