"""Sampler utilities (parity: reference data/sampler/utils.py:13-67).

``image_batch_pairs`` builds the constant-pixel-budget (h, w, batch_size) schedule:
bsz ≈ base_h*base_w*base_bsz / (h*w). On TPU each distinct (h, w, bsz) is one cached
XLA executable, so ``max_scales`` directly bounds compile count (~5 in practice).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def make_video_pairs(
    crop_size_h: int,
    crop_size_w: int,
    min_crop_size_h: int,
    max_crop_size_h: int,
    min_crop_size_w: int,
    max_crop_size_w: int,
    default_frames: int,
    max_scales: int = 5,
    check_scale_div_factor: int = 32,
) -> List[Tuple[int, int, int]]:
    """Constant-voxel-budget (h, w, n_frames) schedule for video batches
    (reference data/sampler/utils.py:70-119): the frame count scales inversely
    with spatial area so every tuple costs ~crop_h*crop_w*default_frames voxels.
    On TPU each tuple is one cached XLA executable, like the image (h, w, bsz)
    pairs."""
    width_dims = create_intervallic_integer_list(
        crop_size_w, min_crop_size_w, max_crop_size_w, max_scales,
        check_scale_div_factor)
    height_dims = create_intervallic_integer_list(
        crop_size_h, min_crop_size_h, max_crop_size_h, max_scales,
        check_scale_div_factor)
    n_elements = crop_size_w * crop_size_h * default_frames
    batch_pairs = set()
    for h, w in zip(height_dims, width_dims):
        n_frames = max(1, int(round(n_elements / (h * w), 2)))
        batch_pairs.add((h, w, n_frames))
    return sorted(batch_pairs)


def create_intervallic_integer_list(
    base_val: int, min_val: int, max_val: int, num_scales: int = 5,
    check_div_factor: int = 32,
) -> List[int]:
    values = set(np.linspace(min_val, max_val, num_scales).astype(int).tolist())
    values.add(base_val)
    out = set()
    for v in values:
        # snap to nearest multiple of check_div_factor
        snapped = int(round(v / check_div_factor) * check_div_factor)
        out.add(max(check_div_factor, snapped))
    return sorted(out)


def image_batch_pairs(
    crop_size_w: int,
    crop_size_h: int,
    batch_size_gpu0: int,
    max_scales: int = 5,
    check_scale_div_factor: int = 32,
    min_crop_size_w: int = 160,
    max_crop_size_w: int = 320,
    min_crop_size_h: int = 160,
    max_crop_size_h: int = 320,
) -> List[Tuple[int, int, int]]:
    width_dims = create_intervallic_integer_list(
        crop_size_w, min_crop_size_w, max_crop_size_w, max_scales,
        check_scale_div_factor,
    )
    height_dims = create_intervallic_integer_list(
        crop_size_h, min_crop_size_h, max_crop_size_h, max_scales,
        check_scale_div_factor,
    )
    pairs = set()
    n_elements = crop_size_w * crop_size_h * batch_size_gpu0
    for crop_h, crop_w in zip(height_dims, width_dims):
        bsz = max(1, int(round(n_elements / (crop_h * crop_w), 2)))
        pairs.add((crop_h, crop_w, bsz))
    return sorted(pairs)
