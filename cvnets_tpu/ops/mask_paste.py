"""Paste fixed-resolution instance masks into full-image masks (static shapes).

Reference parity: torchvision's ``paste_masks_in_image`` used by the reference
Mask R-CNN predict path (/root/reference/cvnets/models/detection/mask_rcnn.py:841-924).
The torchvision version resizes each M×M mask to its (dynamic) box size then pastes
at integer offsets — dynamic shapes XLA cannot compile. The TPU-native formulation
inverts the mapping: every output pixel bilinearly samples the M×M mask at its
box-normalized coordinate, giving one static (N, H, W) gather/compute kernel that
vmaps over detections and fuses under jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def paste_masks(
    masks: jnp.ndarray,  # (N, M, M) mask probabilities in box-local coords
    boxes: jnp.ndarray,  # (N, 4) xyxy in image pixels
    img_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Returns (N, H, W) float mask probabilities (0 outside each box)."""
    h, w = int(img_hw[0]), int(img_hw[1])
    m = masks.shape[-1]
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5

    def paste_one(mask: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        bw = jnp.maximum(x2 - x1, 1e-3)
        bh = jnp.maximum(y2 - y1, 1e-3)
        # half-pixel mapping (matches F.interpolate align_corners=False)
        u = (xs - x1) / bw * m - 0.5  # (W,)
        v = (ys - y1) / bh * m - 0.5  # (H,)

        def axis_weights(c: jnp.ndarray):
            lo = jnp.floor(c)
            frac = c - lo
            lo_i = jnp.clip(lo.astype(jnp.int32), 0, m - 1)
            hi_i = jnp.clip(lo.astype(jnp.int32) + 1, 0, m - 1)
            return lo_i, hi_i, frac

        vy0, vy1, fy = axis_weights(v)
        ux0, ux1, fx = axis_weights(u)
        top = mask[vy0][:, ux0] * (1 - fx)[None, :] + mask[vy0][:, ux1] * fx[None, :]
        bot = mask[vy1][:, ux0] * (1 - fx)[None, :] + mask[vy1][:, ux1] * fx[None, :]
        out = top * (1 - fy)[:, None] + bot * fy[:, None]
        inside = ((xs[None, :] >= x1) & (xs[None, :] <= x2)
                  & (ys[:, None] >= y1) & (ys[:, None] <= y2))
        return jnp.where(inside, out, 0.0)

    return jax.vmap(paste_one)(masks.astype(jnp.float32),
                               boxes.astype(jnp.float32))
