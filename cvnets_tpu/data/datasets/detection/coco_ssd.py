"""COCO SSD dataset: anchor matching in __getitem__ (parity: reference
data/datasets/detection/coco_ssd.py:126-198 + its collate).

The SSD matching runs on the host per sample and yields fixed-size per-anchor
targets — the TPU-friendly layout the SURVEY calls out (§7.7)."""

from __future__ import annotations

import math
import random
from typing import Dict, List, Tuple

import numpy as np

from cvnets_tpu.data.collate import COLLATE_FN_REGISTRY
from cvnets_tpu.data.datasets import DATASET_REGISTRY
from cvnets_tpu.data.datasets.detection.coco_base import COCODetection
from cvnets_tpu.data.transforms.common import Compose
from cvnets_tpu.data.transforms.image import (
    PhotometricDistort,
    RandomHorizontalFlip,
    Resize,
    SSDCroping,
    ToFloatTensor,
)
from cvnets_tpu.models.anchor_generator import build_anchor_generator
from cvnets_tpu.models.matcher_det import build_matcher


@DATASET_REGISTRY.register(name="coco_ssd", type="detection")
class COCOSSDDataset(COCODetection):
    def __init__(self, opts, is_training: bool = True, is_evaluation: bool = False,
                 *args, **kwargs) -> None:
        super().__init__(opts, is_training=is_training, is_evaluation=is_evaluation,
                         *args, **kwargs)
        if getattr(opts, "anchor_generator.name", None) is None:
            setattr(opts, "anchor_generator.name", "ssd")
        if getattr(opts, "matcher.name", None) is None:
            setattr(opts, "matcher.name", "ssd")
        self.anchor_box_generator = build_anchor_generator(opts)
        self.match_prior = build_matcher(opts)
        self.output_strides = self.anchor_box_generator.output_strides

    def generate_anchors(self, height: int, width: int) -> np.ndarray:
        anchors = []
        for os_ in self.output_strides:
            if os_ == -1:
                fh = fw = 1
            else:
                fh = int(math.ceil(height / os_))
                fw = int(math.ceil(width / os_))
            anchors.append(self.anchor_box_generator(fh, fw, os_))
        return np.concatenate(anchors, axis=0)

    def _transforms(self, size: Tuple[int, int]):
        # reference train order (coco_ssd.py:104-124): SSDCroping →
        # PhotometricDistort → Resize → flip; eval is resize-only
        if self.is_training:
            transforms = [
                SSDCroping(self.opts),
                PhotometricDistort(self.opts),
                Resize(self.opts, img_size=list(size)),
                RandomHorizontalFlip(self.opts),
            ]
        elif self.is_evaluation and not getattr(
                self.opts, "evaluation.detection.resize_input_images", False):
            # reference coco_base.py:100-112: offline eval runs at native
            # resolution unless --evaluation.detection.resize-input-images
            transforms = []
        else:
            transforms = [Resize(self.opts, img_size=list(size))]
        transforms.append(ToFloatTensor(self.opts))
        return Compose(self.opts, transforms)

    def __getitem__(self, sample_size_and_index) -> Dict:
        crop_h, crop_w, img_index = self._parse_batch_tuple(sample_size_and_index)
        if crop_h <= 0:
            crop_h = crop_w = 320
        image_id = self.ids[img_index]
        image, _fname = self.get_image(image_id)
        if image is None:
            image_np = np.zeros((crop_h, crop_w, 3), np.float32)
            boxes = np.zeros((0, 4), np.float32)
            labels = np.zeros((0,), np.int64)
        else:
            im_w, im_h = image.size
            boxes, labels, _ = self.get_boxes_and_labels(image_id, im_w, im_h)
            data = self._transforms((crop_h, crop_w))(
                {"image": image, "box_coordinates": boxes, "box_labels": labels}
            )
            image_np = np.asarray(data["image"], np.float32)
            boxes = np.asarray(data.get("box_coordinates", boxes), np.float32)
            labels = np.asarray(data.get("box_labels", labels), np.int64)

        # normalize boxes to [0, 1] (matcher expects normalized corners)
        if boxes.size:
            boxes = boxes / np.asarray(
                [crop_w, crop_h, crop_w, crop_h], np.float32
            )
        anchors = self.generate_anchors(crop_h, crop_w)
        gt_locations, gt_labels = self.match_prior(boxes, labels, anchors)

        info = self.coco.load_image_info(image_id)
        return {
            "samples": image_np,
            "targets": {
                "box_labels": gt_labels,
                "box_coordinates": gt_locations,
                "image_id": int(image_id),
                "image_width": int(info.get("width", crop_w)),
                "image_height": int(info.get("height", crop_h)),
            },
        }


@COLLATE_FN_REGISTRY.register(name="coco_ssd_collate_fn")
def coco_ssd_collate_fn(batch: List[Dict], opts=None) -> Dict:
    from cvnets_tpu.data.collate.collate_functions import default_collate_fn

    return default_collate_fn(batch, opts)
