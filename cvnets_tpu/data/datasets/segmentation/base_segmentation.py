"""Base segmentation dataset (parity: reference
data/datasets/segmentation/base_segmentation.py:328): (image, mask) pairs, train
transforms (random short-size resize, random crop, flip), val resize; masks ride the
transform dict as "mask"."""

from __future__ import annotations

import argparse
from typing import Dict, List, Tuple

import numpy as np

from cvnets_tpu.data.datasets import DATASET_REGISTRY
from cvnets_tpu.data.datasets.dataset_base import BaseImageDataset
from cvnets_tpu.data.transforms.common import Compose
from cvnets_tpu.data.transforms.image import (
    RandomCrop,
    RandomHorizontalFlip,
    RandomShortSizeResize,
    Resize,
    ToFloatTensor,
)


class BaseImageSegmentationDataset(BaseImageDataset):
    # registered as __base__ (argument harvesting only; reference convention)
    ignore_label = 255

    def __init__(self, opts, is_training: bool = True, is_evaluation: bool = False,
                 *args, **kwargs) -> None:
        super().__init__(opts, is_training=is_training, is_evaluation=is_evaluation,
                         *args, **kwargs)
        self.images: List[str] = []
        self.masks: List[str] = []

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BaseImageSegmentationDataset:
            return parser
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--evaluation.segmentation.mode", type=str,
                           default="validation_set",
                           choices=["single_image", "image_folder", "validation_set"])
        group.add_argument("--evaluation.segmentation.path", type=str, default=None)
        group.add_argument("--evaluation.segmentation.apply-color-map",
                           action="store_true")
        group.add_argument("--evaluation.segmentation.save-overlay-rgb-pred",
                           action="store_true")
        group.add_argument("--evaluation.segmentation.save-masks",
                           action="store_true")
        group.add_argument("--evaluation.segmentation.overlay-mask-weight",
                           type=float, default=0.5)
        group.add_argument("--evaluation.segmentation.resize-input-images",
                           action="store_true")
        group.add_argument(
            "--evaluation.segmentation.resize-input-images-fixed-size",
            type=int, nargs="+", default=None,
            help="Resize eval inputs to this fixed (H, W) instead of the "
                 "sampler crop size (reference eval_segmentation.py)")
        return parser

    def _training_transforms(self, size: Tuple[int, int]):
        # conditional augs + optional shuffled order, reference
        # base_segmentation.py:135-159 (RandomShortSizeResize always first)
        from cvnets_tpu.data.transforms.image import PhotometricDistort
        from cvnets_tpu.data.transforms.image_advanced import (
            RandomGaussianBlur,
            RandomOrder,
            RandomRotate,
        )

        opts = self.opts
        first_aug = RandomShortSizeResize(opts)
        aug_list = [
            RandomHorizontalFlip(opts),
            RandomCrop(opts, size=size, ignore_idx=self.ignore_label),
        ]
        if getattr(opts, "image_augmentation.random_gaussian_noise.enable",
                   False):
            aug_list.append(RandomGaussianBlur(opts))
        if getattr(opts, "image_augmentation.photo_metric_distort.enable",
                   False):
            aug_list.append(PhotometricDistort(opts))
        if getattr(opts, "image_augmentation.random_rotate.enable", False):
            aug_list.append(RandomRotate(opts))
        if getattr(opts, "image_augmentation.random_order.enable", False):
            return Compose(opts, [
                first_aug,
                RandomOrder(opts, img_transforms=aug_list),
                ToFloatTensor(opts),
            ])
        return Compose(opts, [first_aug] + aug_list + [ToFloatTensor(opts)])

    def _validation_transforms(self, size: Tuple[int, int]):
        return Compose(self.opts, [
            Resize(self.opts, img_size=list(size)),
            ToFloatTensor(self.opts),
        ])

    def _evaluation_transforms(self, size: Tuple[int, int]):
        """Offline-eval transforms (reference base_segmentation.py:195-215):
        aspect-preserving min-side resize under
        --evaluation.segmentation.resize-input-images, exact resize under
        ...resize-input-images-fixed-size, else no resize."""
        opts = self.opts
        aug_list = []
        fixed = getattr(
            opts, "evaluation.segmentation.resize_input_images_fixed_size",
            None)
        if getattr(opts, "evaluation.segmentation.resize_input_images", False):
            aug_list.append(Resize(opts, img_size=min(size)))
        elif fixed:
            aug_list.append(Resize(opts, img_size=list(fixed)))
        aug_list.append(ToFloatTensor(opts))
        return Compose(opts, aug_list)

    def __len__(self) -> int:
        return len(self.images)

    def _load_mask(self, path: str) -> np.ndarray:
        m = self.read_mask_pil(path)
        return np.asarray(m, np.int32) if m is not None else None

    def adjust_mask_value(self, mask: np.ndarray) -> np.ndarray:
        return mask

    def __getitem__(self, sample_size_and_index) -> Dict:
        crop_h, crop_w, idx = self._parse_batch_tuple(sample_size_and_index)
        if crop_h <= 0:
            crop_h = crop_w = 512
        img = self.read_image_pil(self.images[idx])
        mask = self._load_mask(self.masks[idx])
        if img is None or mask is None:
            return {
                "samples": np.zeros((crop_h, crop_w, 3), np.float32),
                "targets": np.full((crop_h, crop_w), self.ignore_label, np.int32),
                "sample_id": idx,
            }
        mask = self.adjust_mask_value(mask)
        if self.is_training:
            tfm = self._training_transforms((crop_h, crop_w))
        elif self.is_evaluation:
            tfm = self._evaluation_transforms((crop_h, crop_w))
        else:
            tfm = self._validation_transforms((crop_h, crop_w))
        data = tfm({"image": img, "mask": mask, "crop_size": (crop_h, crop_w)})
        arr = np.asarray(data["image"], np.float32)
        m = np.asarray(data["mask"], np.int32)
        if arr.shape[:2] != (crop_h, crop_w):
            # static-shape guarantee
            from PIL import Image

            pil = Image.fromarray((arr * 255).astype(np.uint8))
            arr = np.asarray(pil.resize((crop_w, crop_h)), np.float32) / 255.0
            m_pil = Image.fromarray(m.astype(np.uint8))
            m = np.asarray(m_pil.resize((crop_w, crop_h), Image.NEAREST), np.int32)
        return {"samples": arr, "targets": m, "sample_id": idx}


DATASET_REGISTRY.register(name="__base__", type="segmentation")(
    BaseImageSegmentationDataset)
