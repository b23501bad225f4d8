"""Dummy SSD detection dataset: random boxes matched to anchors host-side,
honoring the (h, w, idx) protocol (mirrors reference tests/dummy_datasets/
ssd_detection.py)."""

from __future__ import annotations

import math
from typing import Dict

import numpy as np

from cvnets_tpu.data.datasets import DATASET_REGISTRY
from cvnets_tpu.data.datasets.dataset_base import BaseImageDataset
from cvnets_tpu.models.anchor_generator import build_anchor_generator
from cvnets_tpu.models.matcher_det import build_matcher


@DATASET_REGISTRY.register(name="dummy_ssd_detection", type="detection")
class DummySSDDetectionDataset(BaseImageDataset):
    def __init__(self, opts, n_samples: int = 16, *args, **kwargs) -> None:
        super().__init__(opts, *args, **kwargs)
        self.n_samples = n_samples
        self.n_classes = getattr(opts, "model.detection.n_classes", 7)
        if getattr(opts, "anchor_generator.name", None) is None:
            setattr(opts, "anchor_generator.name", "ssd")
        if getattr(opts, "matcher.name", None) is None:
            setattr(opts, "matcher.name", "ssd")
        self.anchor_gen = build_anchor_generator(opts)
        self.matcher = build_matcher(opts)

    def _anchors(self, h: int, w: int) -> np.ndarray:
        anchors = []
        for os_ in self.anchor_gen.output_strides:
            fh = fw = 1 if os_ == -1 else 0
            if os_ != -1:
                fh = int(math.ceil(h / os_))
                fw = int(math.ceil(w / os_))
            anchors.append(self.anchor_gen(fh, fw, os_))
        return np.concatenate(anchors, 0)

    def __len__(self) -> int:
        return self.n_samples

    def __getitem__(self, sample_size_and_index) -> Dict:
        crop_h, crop_w, idx = self._parse_batch_tuple(sample_size_and_index)
        if crop_h <= 0:
            crop_h = crop_w = 128
        rng = np.random.default_rng(idx)
        boxes = []
        labels = []
        for _ in range(3):
            x1, y1 = rng.uniform(0, 0.5, 2)
            bw, bh = rng.uniform(0.1, 0.4, 2)
            boxes.append([x1, y1, min(x1 + bw, 1.0), min(y1 + bh, 1.0)])
            labels.append(int(rng.integers(1, self.n_classes)))
        anchors = self._anchors(crop_h, crop_w)
        locs, matched = self.matcher(np.asarray(boxes, np.float32),
                                     np.asarray(labels), anchors)
        return {
            "samples": rng.standard_normal(
                (crop_h, crop_w, 3)).astype(np.float32),
            "targets": {"box_labels": matched, "box_coordinates": locs},
            "sample_id": idx,
        }
