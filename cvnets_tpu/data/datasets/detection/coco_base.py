"""COCO detection dataset base (parity: reference
data/datasets/detection/coco_base.py:360).

Delta vs reference: pycocotools is replaced by a native stdlib-json index (the
annotation format is plain JSON; the C extension only accelerates mask ops, which we
don't need for box training). Category ids are mapped to contiguous labels with 0 =
background, as in the reference.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from cvnets_tpu.data.datasets.dataset_base import BaseImageDataset
from cvnets_tpu.utils import logger


class COCOIndex:
    """Minimal COCO instances-json index: images, annotations-by-image, categories."""

    def __init__(self, ann_file: str) -> None:
        with open(ann_file) as f:
            blob = json.load(f)
        self.images = {im["id"]: im for im in blob.get("images", [])}
        self.cats = {c["id"]: c for c in blob.get("categories", [])}
        self.img_to_anns: Dict[int, List[Dict]] = {im_id: [] for im_id in self.images}
        for ann in blob.get("annotations", []):
            self.img_to_anns.setdefault(ann["image_id"], []).append(ann)

    def image_ids(self) -> List[int]:
        return sorted(self.images.keys())

    def load_image_info(self, img_id: int) -> Dict:
        return self.images[img_id]

    def load_anns(self, img_id: int) -> List[Dict]:
        return self.img_to_anns.get(img_id, [])

    def category_ids(self) -> List[int]:
        return sorted(self.cats.keys())


class COCODetection(BaseImageDataset):
    def __init__(self, opts, is_training: bool = True, is_evaluation: bool = False,
                 *args, **kwargs) -> None:
        super().__init__(opts, is_training=is_training, is_evaluation=is_evaluation,
                         *args, **kwargs)
        split = "train" if is_training else "val"
        year = 2017
        ann_file = os.path.join(
            self.root, "annotations", f"instances_{split}{year}.json"
        )
        if not os.path.isfile(ann_file):
            logger.error(f"COCO annotation file not found: {ann_file}")
        self.coco = COCOIndex(ann_file)
        self.img_dir = os.path.join(self.root, f"{split}{year}")
        self.ids = [
            img_id for img_id in self.coco.image_ids()
            if not is_training or len(self.coco.load_anns(img_id)) > 0
        ]
        cat_ids = self.coco.category_ids()
        # contiguous labels; 0 is background unless --dataset.detection
        # .no-background-id is set (reference coco_base.py background handling)
        no_bg = getattr(opts, "dataset.detection.no_background_id", False)
        offset = 0 if no_bg else 1
        self.coco_id_to_contiguous_id = {c: i + offset
                                         for i, c in enumerate(cat_ids)}
        self.contiguous_id_to_coco_id = {v: k for k, v in
                                         self.coco_id_to_contiguous_id.items()}
        self.n_classes = len(cat_ids) + offset

    def share_dataset_arguments(self) -> Dict:
        return {"model.detection.n_classes": self.n_classes}

    def __len__(self) -> int:
        return len(self.ids)

    def get_image(self, image_id: int):
        info = self.coco.load_image_info(image_id)
        path = os.path.join(self.img_dir, info["file_name"])
        return self.read_image_pil(path), info["file_name"]

    def get_boxes_and_labels(
        self, image_id: int, image_width: int, image_height: int,
        include_masks: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, Optional[List]]:
        anns = self.coco.load_anns(image_id)
        boxes, labels, masks = [], [], []
        for ann in anns:
            if ann.get("iscrowd", 0):
                continue
            x, y, w, h = ann["bbox"]
            if w < 1 or h < 1:
                continue
            x2 = min(x + w, image_width)
            y2 = min(y + h, image_height)
            x, y = max(0, x), max(0, y)
            if x2 <= x or y2 <= y:
                continue
            boxes.append([x, y, x2, y2])
            labels.append(self.coco_id_to_contiguous_id[ann["category_id"]])
            if include_masks:
                masks.append(ann.get("segmentation"))
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        labels = np.asarray(labels, np.int64)
        return boxes, labels, masks if include_masks else None
