"""Dummy classification dataset honoring the (crop_h, crop_w, idx) batch-tuple
protocol (mirrors reference tests/dummy_datasets/classification.py:12-55)."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from cvnets_tpu.data.datasets import DATASET_REGISTRY
from cvnets_tpu.data.datasets.dataset_base import BaseImageDataset


@DATASET_REGISTRY.register(name="dummy_classification", type="classification")
class DummyClassificationDataset(BaseImageDataset):
    def __init__(self, opts, n_samples: int = 64, n_classes: int = 10,
                 *args, **kwargs) -> None:
        super().__init__(opts, *args, **kwargs)
        self.n_samples = n_samples
        self.n_classes = getattr(opts, "model.classification.n_classes", None) or n_classes

    def __len__(self) -> int:
        return self.n_samples

    def __getitem__(self, sample_size_and_index: Tuple[int, int, int]) -> Dict:
        crop_h, crop_w, idx = self._parse_batch_tuple(sample_size_and_index)
        if crop_h <= 0:
            crop_h = crop_w = 32
        rng = np.random.default_rng(idx)
        return {
            "samples": rng.standard_normal((crop_h, crop_w, 3)).astype(np.float32),
            "targets": int(idx % self.n_classes),
            "sample_id": idx,
        }
