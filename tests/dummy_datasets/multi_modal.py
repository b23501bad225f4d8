"""Dummy image-text dataset for CLIP Trainer smokes (mirrors reference
tests/dummy_datasets/multi_modal_img_text.py): random image + random token ids
honoring the (h, w, idx) protocol."""

from __future__ import annotations

from typing import Dict

import numpy as np

from cvnets_tpu.data.datasets import DATASET_REGISTRY
from cvnets_tpu.data.datasets.dataset_base import BaseImageDataset


@DATASET_REGISTRY.register(name="dummy_img_text", type="multi_modal_image_text")
class DummyImgTextDataset(BaseImageDataset):
    def __init__(self, opts, n_samples: int = 16, *args, **kwargs) -> None:
        super().__init__(opts, *args, **kwargs)
        self.n_samples = n_samples
        self.context_length = getattr(opts, "model.text.context_length", 16)
        self.vocab_size = getattr(opts, "model.text.vocab_size", 100)

    def __len__(self) -> int:
        return self.n_samples

    def __getitem__(self, sample_size_and_index) -> Dict:
        crop_h, crop_w, idx = self._parse_batch_tuple(sample_size_and_index)
        if crop_h <= 0:
            crop_h = crop_w = 32
        rng = np.random.default_rng(idx)
        return {
            "samples": {
                "image": rng.standard_normal(
                    (crop_h, crop_w, 3)).astype(np.float32),
                "text": rng.integers(
                    1, self.vocab_size - 1,
                    (self.context_length,)).astype(np.int64),
            },
            "targets": idx,
            "sample_id": idx,
        }
