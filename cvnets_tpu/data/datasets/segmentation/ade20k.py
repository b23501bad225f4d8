"""ADE20k dataset (parity: reference data/datasets/segmentation/ade20k.py:383 —
150 classes; raw label 0 = background mapped to ignore, labels shift by -1)."""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from cvnets_tpu.data.datasets import DATASET_REGISTRY
from cvnets_tpu.data.datasets.segmentation.base_segmentation import (
    BaseImageSegmentationDataset,
)


@DATASET_REGISTRY.register(name="ade20k", type="segmentation")
class ADE20KDataset(BaseImageSegmentationDataset):
    n_seg_classes = 150

    def __init__(self, opts, is_training: bool = True, is_evaluation: bool = False,
                 *args, **kwargs) -> None:
        super().__init__(opts, is_training=is_training, is_evaluation=is_evaluation,
                         *args, **kwargs)
        split = "training" if is_training else "validation"
        img_dir = os.path.join(self.root, "images", split)
        ann_dir = os.path.join(self.root, "annotations", split)
        if os.path.isdir(img_dir):
            for fname in sorted(os.listdir(img_dir)):
                if fname.endswith(".jpg"):
                    self.images.append(os.path.join(img_dir, fname))
                    self.masks.append(
                        os.path.join(ann_dir, fname.replace(".jpg", ".png"))
                    )

    def share_dataset_arguments(self) -> Dict:
        return {"model.segmentation.n_classes": self.n_seg_classes}

    def adjust_mask_value(self, mask: np.ndarray) -> np.ndarray:
        # raw 0 is "other"; shift to [0, 149] with 255 ignore (reference ade20k.py)
        mask = mask.astype(np.int32) - 1
        mask[mask < 0] = self.ignore_label
        return mask


@DATASET_REGISTRY.register(name="pascal", type="segmentation")
class PascalVOCDataset(BaseImageSegmentationDataset):
    """PASCAL VOC 2012 segmentation (parity: reference pascal_voc.py:165; 21
    classes incl. background; optionally uses the SBD-augmented list)."""

    n_seg_classes = 21

    def __init__(self, opts, is_training: bool = True, is_evaluation: bool = False,
                 *args, **kwargs) -> None:
        super().__init__(opts, is_training=is_training, is_evaluation=is_evaluation,
                         *args, **kwargs)
        use_coco_data = getattr(opts, "dataset.pascal.use_coco_data", False)
        coco_root = getattr(opts, "dataset.pascal.coco_root_dir", None)
        voc_root = os.path.join(self.root, "VOC2012")
        split_file = os.path.join(
            voc_root, "list",
            "train_aug.txt" if is_training else "val.txt",
        )
        if os.path.isfile(split_file):
            with open(split_file) as f:
                for line in f:
                    parts = line.strip().split()
                    if len(parts) >= 2:
                        self.images.append(voc_root + parts[0])
                        self.masks.append(voc_root + parts[1])
        else:
            seg_dir = os.path.join(voc_root, "ImageSets", "Segmentation")
            lst = os.path.join(seg_dir, "train.txt" if is_training else "val.txt")
            if os.path.isfile(lst):
                with open(lst) as f:
                    for name in f.read().split():
                        self.images.append(
                            os.path.join(voc_root, "JPEGImages", f"{name}.jpg"))
                        self.masks.append(
                            os.path.join(voc_root, "SegmentationClass", f"{name}.png"))

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--dataset.pascal.use-coco-data", action="store_true")
        group.add_argument("--dataset.pascal.coco-root-dir", type=str, default=None)
        return parser

    def share_dataset_arguments(self) -> Dict:
        return {"model.segmentation.n_classes": self.n_seg_classes}


@DATASET_REGISTRY.register(name="coco_segmentation", type="segmentation")
class COCOSegmentation(BaseImageSegmentationDataset):
    """COCO-stuff style segmentation over VOC classes (parity: reference
    coco_segmentation.py:178). Requires pre-rendered mask pngs."""

    n_seg_classes = 21

    def __init__(self, opts, is_training: bool = True, is_evaluation: bool = False,
                 *args, **kwargs) -> None:
        super().__init__(opts, is_training=is_training, is_evaluation=is_evaluation,
                         *args, **kwargs)
        split = "train2017" if is_training else "val2017"
        img_dir = os.path.join(self.root, split)
        mask_dir = os.path.join(self.root, "masks", split)
        if os.path.isdir(mask_dir):
            for fname in sorted(os.listdir(mask_dir)):
                if fname.endswith(".png"):
                    self.images.append(
                        os.path.join(img_dir, fname.replace(".png", ".jpg")))
                    self.masks.append(os.path.join(mask_dir, fname))

    def share_dataset_arguments(self) -> Dict:
        return {"model.segmentation.n_classes": self.n_seg_classes}
