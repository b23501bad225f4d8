"""Dummy segmentation dataset (mirrors reference tests/dummy_datasets/segmentation)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from cvnets_tpu.data.datasets import DATASET_REGISTRY
from cvnets_tpu.data.datasets.dataset_base import BaseImageDataset


@DATASET_REGISTRY.register(name="dummy_segmentation", type="segmentation")
class DummySegmentationDataset(BaseImageDataset):
    def __init__(self, opts, n_samples: int = 16, n_classes: int = 5,
                 *args, **kwargs) -> None:
        super().__init__(opts, *args, **kwargs)
        self.n_samples = n_samples
        self.n_classes = getattr(opts, "model.segmentation.n_classes", None) \
            or n_classes

    def share_dataset_arguments(self) -> Dict:
        return {"model.segmentation.n_classes": self.n_classes}

    def __len__(self) -> int:
        return self.n_samples

    def __getitem__(self, sample_size_and_index) -> Dict:
        crop_h, crop_w, idx = self._parse_batch_tuple(sample_size_and_index)
        if crop_h <= 0:
            crop_h = crop_w = 32
        rng = np.random.default_rng(idx)
        return {
            "samples": rng.uniform(0, 1, (crop_h, crop_w, 3)).astype(np.float32),
            "targets": rng.integers(0, self.n_classes,
                                    (crop_h, crop_w)).astype(np.int32),
            "sample_id": idx,
        }
