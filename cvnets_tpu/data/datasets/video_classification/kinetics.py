"""Kinetics-style video classification dataset (parity: reference
data/datasets/video_classification/kinetics.py + datasets/utils/video.py:432).

Layout: root/<split>/<class_name>/<video>/frame_*.jpg (frame-folder clips) or
container files when a pyav/decord reader is selected."""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from cvnets_tpu.data.collate import COLLATE_FN_REGISTRY
from cvnets_tpu.data.datasets import DATASET_REGISTRY
from cvnets_tpu.data.datasets.dataset_base import BaseDataset
from cvnets_tpu.data.video_reader import get_video_reader


@DATASET_REGISTRY.register(name="kinetics", type="video_classification")
class KineticsDataset(BaseDataset):
    def __init__(self, opts, is_training: bool = True, is_evaluation: bool = False,
                 *args, **kwargs) -> None:
        super().__init__(opts, is_training=is_training, is_evaluation=is_evaluation,
                         *args, **kwargs)
        self.video_reader = get_video_reader(opts, is_training=is_training)
        self.samples: List[Tuple[str, int]] = []
        root = self.root
        if root and os.path.isdir(root):
            classes = sorted(d.name for d in os.scandir(root) if d.is_dir())
            self.class_to_idx = {c: i for i, c in enumerate(classes)}
            for cls in classes:
                cdir = os.path.join(root, cls)
                for entry in sorted(os.listdir(cdir)):
                    self.samples.append(
                        (os.path.join(cdir, entry), self.class_to_idx[cls])
                    )
        else:
            self.class_to_idx = {}

    def share_dataset_arguments(self) -> Dict:
        if self.class_to_idx:
            return {"model.classification.n_classes": len(self.class_to_idx)}
        return {}

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, sample_size_and_index) -> Dict:
        crop_h, crop_w, idx = self._parse_batch_tuple(sample_size_and_index)
        if crop_h <= 0:
            crop_h = crop_w = 224
        path, target = self.samples[idx]
        blob = self.video_reader.read_video(path)
        T = self.video_reader.frames_per_clip
        n_clips = self.video_reader.clips_per_video
        if blob is None:
            video = np.zeros((n_clips, T, crop_h, crop_w, 3), np.float32)
            target = -1
        else:
            from PIL import Image

            clips = []
            for clip in blob["video"]:
                frames = []
                for frame in clip:
                    pil = Image.fromarray((frame * 255).astype(np.uint8))
                    pil = pil.resize((crop_w, crop_h))
                    frames.append(np.asarray(pil, np.float32) / 255.0)
                clips.append(np.stack(frames))
            video = np.stack(clips)
        return {"samples": video, "targets": int(target), "sample_id": idx}


@COLLATE_FN_REGISTRY.register(name="default_video_collate_fn")
def default_video_collate_fn(batch: List[Dict], opts=None) -> Dict:
    """Stacks to (B, n_clips, T, H, W, C); the model folds clips into the batch."""
    from cvnets_tpu.data.collate.collate_functions import default_collate_fn

    return default_collate_fn(batch, opts)
