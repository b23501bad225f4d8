"""ImageFolder-backed classification dataset.

Parity: reference data/datasets/classification/base_image_classification_dataset.py:19
— directory-per-class layout, percentage subset sampling, corrupt-image tolerance
(zero tensor + label -1, dropped/replaced in collate), and the train transform chain
driven by the sampler's (crop_h, crop_w, idx) tuples.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from cvnets_tpu.constants import SUPPORTED_IMAGE_EXTNS
from cvnets_tpu.data.datasets.dataset_base import BaseImageDataset
from cvnets_tpu.data.transforms.common import Compose
from cvnets_tpu.data.transforms.image import (
    CenterCrop,
    RandomHorizontalFlip,
    RandomResizedCrop,
    Resize,
    ToFloatTensor,
)
from cvnets_tpu.utils import logger


def _find_classes(root: str) -> Tuple[List[str], Dict[str, int]]:
    classes = sorted(
        d.name for d in os.scandir(root) if d.is_dir()
    )
    return classes, {c: i for i, c in enumerate(classes)}


class BaseImageClassificationDataset(BaseImageDataset):
    def __init__(self, opts, is_training: bool = True, is_evaluation: bool = False,
                 *args, **kwargs) -> None:
        super().__init__(opts, is_training=is_training, is_evaluation=is_evaluation,
                         *args, **kwargs)
        root = self.root
        if not root or not os.path.isdir(root):
            logger.error(f"Classification dataset root not found: {root!r}")
        self.classes, self.class_to_idx = _find_classes(root)
        samples: List[Tuple[str, int]] = []
        for cls_name in self.classes:
            cls_dir = os.path.join(root, cls_name)
            for dirpath, _d, files in sorted(os.walk(cls_dir)):
                for f in sorted(files):
                    if os.path.splitext(f)[1].lower() in SUPPORTED_IMAGE_EXTNS:
                        samples.append(
                            (os.path.join(dirpath, f), self.class_to_idx[cls_name])
                        )
        pct = getattr(opts, "dataset.percentage_of_samples", 100.0) or 100.0
        n_per_cat = getattr(opts, "dataset.num_samples_per_category", -1) or -1
        if is_training and n_per_cat > 0 and 0 < pct < 100:
            logger.error(
                "Specify only one of dataset.num_samples_per_category and "
                "dataset.percentage_of_samples (reference "
                "base_image_classification_dataset.py:81)")
        if is_training and (pct < 100.0 or n_per_cat > 0):
            seed = getattr(opts, "dataset.sample_selection_random_seed", None)
            if seed is None:
                seed = getattr(opts, "common.seed", 0) or 0
            rng = np.random.default_rng(seed)
            # per-class subset to keep class balance (reference subset sampling)
            keep = []
            by_class: Dict[int, List] = {}
            for s in samples:
                by_class.setdefault(s[1], []).append(s)
            for cls_samples in by_class.values():
                if n_per_cat > 0:
                    n_keep = min(n_per_cat, len(cls_samples))
                else:
                    n_keep = max(1, int(len(cls_samples) * pct / 100.0))
                idx = rng.permutation(len(cls_samples))[:n_keep]
                keep.extend(cls_samples[i] for i in idx)
            samples = keep
        self.samples = samples
        self.n_classes = len(self.classes)

    def share_dataset_arguments(self) -> Dict:
        return {"model.classification.n_classes": self.n_classes}

    def _training_transforms(self, size: Tuple[int, int]):
        opts = self.opts
        transforms = []
        if getattr(opts, "image_augmentation.random_resized_crop.enable", False):
            transforms.append(RandomResizedCrop(opts, size=size))
        else:
            transforms.append(Resize(opts, img_size=list(size)))
        if getattr(opts, "image_augmentation.random_horizontal_flip.enable", False):
            transforms.append(RandomHorizontalFlip(opts))
        # policy augs: true AutoAugment / timm RandAugment run host-side on PIL
        # (device-tier RandAugment/TrivialAugment stay in ops/image_ops.py)
        if getattr(opts, "image_augmentation.auto_augment.enable", False):
            from cvnets_tpu.data.transforms.image_advanced import AutoAugment

            transforms.append(AutoAugment(opts))
        if getattr(opts, "image_augmentation.rand_augment.use_timm_library", False):
            from cvnets_tpu.data.transforms.image_advanced import RandAugmentTimm

            transforms.append(RandAugmentTimm(opts))
        transforms.append(ToFloatTensor(opts))
        return Compose(opts, transforms)

    def _validation_transforms(self, size: Tuple[int, int]):
        opts = self.opts
        transforms = []
        if getattr(opts, "image_augmentation.resize.enable", False):
            transforms.append(Resize(opts))
        if getattr(opts, "image_augmentation.center_crop.enable", False):
            transforms.append(CenterCrop(opts))
        else:
            transforms.append(Resize(opts, img_size=list(size)))
        transforms.append(ToFloatTensor(opts))
        return Compose(opts, transforms)

    def __len__(self) -> int:
        return len(self.samples)

    def _native_fast_path(self, path: str, target: int, idx: int,
                          crop_h: int, crop_w: int):
        """Collapse decode -> RandomResizedCrop -> flip into ONE native call
        (C++ thread-pooled libjpeg; cvnets_tpu/native/decode.cpp). Only valid
        for the plain RRC(+flip) train pipeline on JPEG files; returns None to
        fall back to the PIL path otherwise."""
        opts = self.opts
        if not (self.is_training
                and getattr(opts, "dataset.decoder", "pil") == "native"
                and path.lower().endswith((".jpg", ".jpeg"))
                and getattr(opts, "image_augmentation.random_resized_crop.enable",
                            False)
                and not getattr(opts, "image_augmentation.auto_augment.enable",
                                False)
                and not getattr(opts,
                                "image_augmentation.rand_augment.use_timm_library",
                                False)):
            return None
        from cvnets_tpu import native
        from cvnets_tpu.data.transforms.image import RandomResizedCrop

        if native.load_library() is None:
            return None
        try:
            with open(path, "rb") as f:
                blob = f.read()
            dims = native.jpeg_dimensions(blob)
            if dims is None:
                return None
            w, h = dims
            rrc = self._rrc_cache if hasattr(self, "_rrc_cache") else \
                RandomResizedCrop(opts, size=(crop_h, crop_w))
            self._rrc_cache = rrc
            i, j, ch, cw = rrc.get_params(h, w)
            out = native.decode_crop_resize_batch(
                [blob], [(j, i, cw, ch)], (crop_h, crop_w), n_threads=1)
            if out is None or not out[1][0]:
                return None
            arr = out[0][0].astype(np.float32) / 255.0
            if getattr(opts, "image_augmentation.random_horizontal_flip.enable",
                       False) and np.random.rand() < 0.5:
                arr = np.ascontiguousarray(arr[:, ::-1])
            return {"samples": arr, "targets": int(target), "sample_id": idx}
        except Exception:
            return None

    def _native_batch_eligible(self) -> bool:
        opts = self.opts
        return bool(
            self.is_training
            and getattr(opts, "dataset.decoder", "pil") == "native"
            and getattr(opts, "image_augmentation.random_resized_crop.enable",
                        False)
            and not getattr(opts, "image_augmentation.auto_augment.enable", False)
            and not getattr(
                opts, "image_augmentation.rand_augment.use_timm_library", False))

    def fetch_batch_native(self, batch_tuples) -> Optional[Dict]:
        """Whole-batch fast path: ONE native call decodes every JPEG straight
        into the collated uint8 batch buffer (C++ thread pool, crop-region-only
        IDCT, in-kernel flip; cvnets_tpu/native/decode.cpp). Pixels stay uint8
        on the host — normalization to [0, 1] happens on device inside the
        compiled train step, quartering host memory traffic. Returns None to
        fall back to the per-sample path (non-JPEG files, policy augs, or no
        native library)."""
        if not self._native_batch_eligible():
            return None
        from cvnets_tpu import native
        from cvnets_tpu.data.transforms.image import RandomResizedCrop

        if native.load_library() is None:
            return None
        parsed = [self._parse_batch_tuple(t) for t in batch_tuples]
        crop_h = parsed[0][0] if parsed[0][0] > 0 else 224
        crop_w = parsed[0][1] if parsed[0][1] > 0 else 224
        idxs = [p[2] for p in parsed]
        paths = []
        targets = []
        for idx in idxs:
            path, target = self.samples[idx]
            if not path.lower().endswith((".jpg", ".jpeg")):
                return None
            paths.append(path)
            targets.append(target)
        try:
            blobs = []
            for p in paths:
                with open(p, "rb") as f:
                    blobs.append(f.read())
        except OSError:
            return None

        # per-file dimension cache: the header probe is paid once per epoch 0
        dims_cache = getattr(self, "_dims_cache", None)
        if dims_cache is None:
            dims_cache = self._dims_cache = {}
        missing = [k for k, idx in enumerate(idxs) if idx not in dims_cache]
        if missing:
            probed = native.jpeg_dimensions_batch([blobs[k] for k in missing])
            if probed is None:
                return None
            for k, (w, h) in zip(missing, probed):
                dims_cache[idxs[k]] = (int(w), int(h))

        rrc = getattr(self, "_rrc_cache", None)
        if rrc is None:
            rrc = self._rrc_cache = RandomResizedCrop(
                self.opts, size=(crop_h, crop_w))
        crops = []
        for idx in idxs:
            w, h = dims_cache[idx]
            if w <= 0 or h <= 0:
                crops.append((0, 0, -1, -1))  # corrupt header: decode will fail
                continue
            i, j, ch, cw = rrc.get_params(h, w)
            crops.append((j, i, cw, ch))
        if getattr(self.opts, "image_augmentation.random_horizontal_flip.enable",
                   False):
            flips = (np.random.rand(len(idxs)) < 0.5).astype(np.uint8)
        else:
            flips = None
        res = native.decode_rrc_batch(blobs, crops, flips, (crop_h, crop_w))
        if res is None:
            return None
        samples, ok = res
        targets = np.asarray(targets, np.int32)
        sample_ids = np.asarray(idxs, np.int64)
        if not ok.all():
            # corrupt-sample protocol under static shapes: replace failed slots
            # with repeats of valid ones (collate_functions._replace_corrupt)
            valid = np.nonzero(ok)[0]
            if valid.size == 0:
                targets = np.full_like(targets, -1)
            else:
                bad = np.nonzero(~ok)[0]
                repl = valid[np.arange(bad.size) % valid.size]
                samples[bad] = samples[repl]
                targets[bad] = targets[repl]
                sample_ids[bad] = sample_ids[repl]
        return {"samples": samples, "targets": targets, "sample_id": sample_ids}

    def __getitem__(self, sample_size_and_index) -> Dict:
        crop_h, crop_w, idx = self._parse_batch_tuple(sample_size_and_index)
        if crop_h <= 0:
            crop_h = crop_w = 224
        path, target = self.samples[idx]
        fast = self._native_fast_path(path, target, idx, crop_h, crop_w)
        if fast is not None:
            return fast
        img = self.read_image_pil(path)
        if img is None:
            # corrupt image: zero tensor + label -1 (reference :276-286)
            return {
                "samples": np.zeros((crop_h, crop_w, 3), np.float32),
                "targets": -1,
                "sample_id": idx,
            }
        tfm = (self._training_transforms((crop_h, crop_w)) if self.is_training
               else self._validation_transforms((crop_h, crop_w)))
        data = tfm({"image": img, "crop_size": (crop_h, crop_w)})
        arr = np.asarray(data["image"], dtype=np.float32)
        # guarantee the static batch shape even if transforms were disabled
        if arr.shape[:2] != (crop_h, crop_w):
            from cvnets_tpu.data.transforms.image import _resize_image

            arr = np.asarray(_resize_image(arr, (crop_h, crop_w)),
                             dtype=np.float32) / 255.0
        return {"samples": arr, "targets": int(target), "sample_id": idx}
