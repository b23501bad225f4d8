"""Dummy video-classification dataset: random clips honoring the batch-tuple
protocol (mirrors the reference dummy-dataset test pattern for Kinetics)."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from cvnets_tpu.data.datasets import DATASET_REGISTRY
from cvnets_tpu.data.datasets.dataset_base import BaseImageDataset


@DATASET_REGISTRY.register(name="dummy_video", type="video_classification")
class DummyVideoDataset(BaseImageDataset):
    def __init__(self, opts, n_samples: int = 16, n_classes: int = 6,
                 *args, **kwargs) -> None:
        super().__init__(opts, *args, **kwargs)
        self.n_samples = n_samples
        self.n_classes = getattr(opts, "model.video_classification.n_classes",
                                 None) or n_classes
        self.n_frames = getattr(opts, "dataset.kinetics.num_frames_per_clip",
                                None) or 4

    def __len__(self) -> int:
        return self.n_samples

    def __getitem__(self, sample_size_and_index: Tuple[int, int, int]) -> Dict:
        crop_h, crop_w, idx = self._parse_batch_tuple(sample_size_and_index)
        if crop_h <= 0:
            crop_h = crop_w = 32
        rng = np.random.default_rng(idx)
        clip = rng.standard_normal(
            (self.n_frames, crop_h, crop_w, 3)).astype(np.float32)
        return {"samples": clip, "targets": int(idx % self.n_classes),
                "sample_id": idx}
