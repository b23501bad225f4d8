"""COCO dataset for Mask R-CNN training (parity: reference
data/datasets/detection/coco_mask_rcnn.py:199 + its collate).

Emits padded fixed-size targets per image — boxes (MAX_GT, 4) in pixels, labels
(MAX_GT; 0 = padding) and binary masks (MAX_GT, Hm, Wm) — the static layout the
native Mask R-CNN trains on. Polygon segmentations rasterize with a pure-numpy
even-odd scanline fill (replaces pycocotools' C mask ops)."""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from cvnets_tpu.data.collate import COLLATE_FN_REGISTRY
from cvnets_tpu.data.datasets import DATASET_REGISTRY
from cvnets_tpu.data.datasets.detection.coco_base import COCODetection
from cvnets_tpu.data.transforms.common import Compose
from cvnets_tpu.data.transforms.image import (
    RandomHorizontalFlip,
    Resize,
    ToFloatTensor,
)
from cvnets_tpu.models.detection.mask_rcnn import MAX_GT

MASK_DOWNSAMPLE = 4  # store gt masks at 1/4 image resolution (memory)


def rasterize_polygon(polys: Sequence[Sequence[float]], height: int,
                      width: int) -> np.ndarray:
    """Even-odd scanline rasterization of COCO polygon lists -> bool (H, W)."""
    mask = np.zeros((height, width), bool)
    for poly in polys:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        if len(pts) < 3:
            continue
        xs, ys = pts[:, 0], pts[:, 1]
        y0 = max(0, int(np.floor(ys.min())))
        y1 = min(height - 1, int(np.ceil(ys.max())))
        x2 = np.roll(xs, -1)
        y2 = np.roll(ys, -1)
        for row in range(y0, y1 + 1):
            yc = row + 0.5
            # edges crossing this scanline
            cond = ((ys <= yc) & (y2 > yc)) | ((y2 <= yc) & (ys > yc))
            if not cond.any():
                continue
            with np.errstate(divide="ignore", invalid="ignore"):
                x_int = xs[cond] + (yc - ys[cond]) / (y2[cond] - ys[cond]) \
                    * (x2[cond] - xs[cond])
            x_int = np.sort(x_int)
            for i in range(0, len(x_int) - 1, 2):
                a = max(0, int(np.ceil(x_int[i] - 0.5)))
                b = min(width, int(np.ceil(x_int[i + 1] - 0.5)))
                if b > a:
                    mask[row, a:b] ^= True
    return mask


@DATASET_REGISTRY.register(name="coco_mask_rcnn", type="detection")
class COCOMaskRCNNDataset(COCODetection):
    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--dataset.detection.coco-mask-rcnn.use-lsj-aug",
                           action="store_true", default=False,
                           help="Large Scale Jitter training augmentation "
                                "(reference coco_mask_rcnn.py:40-72)")
        return parser

    def _transforms(self, size):
        use_lsj = getattr(self.opts,
                          "dataset.detection.coco_mask_rcnn.use_lsj_aug", False)
        if self.is_training and use_lsj:
            from cvnets_tpu.data.transforms.image_advanced import (
                FixedSizeCrop,
                ScaleJitter,
            )

            if getattr(self.opts,
                       "image_augmentation.scale_jitter.target_size", None) is None:
                setattr(self.opts, "image_augmentation.scale_jitter.target_size",
                        list(size))
            transforms = [ScaleJitter(self.opts),
                          FixedSizeCrop(self.opts, size=list(size)),
                          RandomHorizontalFlip(self.opts)]
        else:
            transforms = [Resize(self.opts, img_size=list(size))]
            if self.is_training:
                transforms.append(RandomHorizontalFlip(self.opts))
        transforms.append(ToFloatTensor(self.opts))
        return Compose(self.opts, transforms)

    def __getitem__(self, sample_size_and_index) -> Dict:
        crop_h, crop_w, img_index = self._parse_batch_tuple(sample_size_and_index)
        if crop_h <= 0:
            crop_h = crop_w = 512
        image_id = self.ids[img_index]
        image, _ = self.get_image(image_id)

        boxes_p = np.zeros((MAX_GT, 4), np.float32)
        labels_p = np.zeros((MAX_GT,), np.int64)
        mh, mw = crop_h // MASK_DOWNSAMPLE, crop_w // MASK_DOWNSAMPLE
        masks_p = np.zeros((MAX_GT, mh, mw), np.float32)

        if image is None:
            image_np = np.zeros((crop_h, crop_w, 3), np.float32)
        else:
            im_w, im_h = image.size
            boxes, labels, segs = self.get_boxes_and_labels(
                image_id, im_w, im_h, include_masks=True)
            data = self._transforms((crop_h, crop_w))(
                {"image": image, "box_coordinates": boxes, "box_labels": labels})
            image_np = np.asarray(data["image"], np.float32)
            boxes = np.asarray(data.get("box_coordinates", boxes), np.float32)
            n = min(len(labels), MAX_GT)
            boxes_p[:n] = boxes[:n]
            labels_p[:n] = labels[:n]
            sx = mw / im_w
            sy = mh / im_h
            for gi in range(n):
                seg = segs[gi] if segs else None
                if isinstance(seg, list) and seg:
                    scaled = [
                        (np.asarray(p).reshape(-1, 2)
                         * np.asarray([sx, sy])).reshape(-1).tolist()
                        for p in seg if len(p) >= 6
                    ]
                    if scaled:
                        masks_p[gi] = rasterize_polygon(scaled, mh, mw)
                else:
                    # RLE or missing: fall back to the box region
                    x1, y1, x2, y2 = (boxes_p[gi] * np.asarray(
                        [mw / crop_w, mh / crop_h, mw / crop_w, mh / crop_h]))
                    masks_p[gi, int(y1):int(y2) + 1, int(x1):int(x2) + 1] = 1.0

        targets = {
            "box_coordinates": boxes_p,
            "box_labels": labels_p,
            "masks": masks_p,
            "image_id": int(image_id),
        }
        return {"samples": {"image": image_np, "targets": targets},
                "targets": targets, "sample_id": img_index}


@COLLATE_FN_REGISTRY.register(name="coco_mask_rcnn_collate_fn")
def coco_mask_rcnn_collate_fn(batch: List[Dict], opts=None) -> Dict:
    from cvnets_tpu.data.collate.collate_functions import default_collate_fn

    return default_collate_fn(batch, opts)
