"""Box/mask drawing (parity: reference utils/visualization_utils.py)."""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from cvnets_tpu.utils.color_map import Colormap

FONT_COLOR = (255, 255, 255)


def draw_bounding_boxes(
    image: np.ndarray,  # HWC uint8
    boxes: np.ndarray,  # (N, 4) xyxy absolute
    labels: Sequence[int],
    scores: Sequence[float],
    class_names: Optional[List[str]] = None,
    color_map=None,
    score_threshold: float = 0.0,
) -> np.ndarray:
    from PIL import Image, ImageDraw

    pil = Image.fromarray(image)
    draw = ImageDraw.Draw(pil)
    cmap = color_map if color_map is not None else Colormap().get_color_map()
    for box, label, score in zip(boxes, labels, scores):
        if score < score_threshold:
            continue
        color = tuple(int(c) for c in cmap[int(label) % len(cmap)])
        x1, y1, x2, y2 = [float(v) for v in box]
        draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
        caption = (class_names[int(label)] if class_names
                   and int(label) < len(class_names) else str(int(label)))
        draw.text((x1 + 2, max(0, y1 - 12)), f"{caption}:{score:.2f}", fill=color)
    return np.asarray(pil)


def convert_to_cityscape_format(mask: np.ndarray, mapping: dict) -> np.ndarray:
    """Remap contiguous train ids to cityscapes label ids (reference
    engine/segmentation_utils/cityscapes_iou.py companion)."""
    out = np.zeros_like(mask)
    for train_id, label_id in mapping.items():
        out[mask == train_id] = label_id
    return out
