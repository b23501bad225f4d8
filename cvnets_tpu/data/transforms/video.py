"""Video transforms (parity: reference data/transforms/video.py, 1,201 LoC —
the spatial ops apply per frame; temporal ops subsample/crop the clip)."""

from __future__ import annotations

import argparse
import random
from typing import Dict

import numpy as np

from cvnets_tpu.data.transforms import TRANSFORMATIONS_REGISTRY
from cvnets_tpu.data.transforms.common import BaseTransformation


class PerFrame(BaseTransformation):
    """Apply an image transform to every frame of data["video"] (T, H, W, C)."""

    def __init__(self, opts, image_transform, **kwargs) -> None:
        super().__init__(opts)
        self.image_transform = image_transform

    def __call__(self, data: Dict) -> Dict:
        frames = []
        for frame in data["video"]:
            out = self.image_transform({"image": frame,
                                        "crop_size": data.get("crop_size")})
            frames.append(np.asarray(out["image"], np.float32))
        data["video"] = np.stack(frames)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="video_resize", type="video")
class VideoResize(BaseTransformation):
    def __init__(self, opts, size=None, **kwargs) -> None:
        super().__init__(opts)
        self.size = size or getattr(opts, "video_augmentation.resize.size", 224)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--video-augmentation.resize.enable",
                           action="store_true", default=False)
        group.add_argument("--video-augmentation.resize.size", type=int,
                           nargs="+", default=224)
        return parser

    def __call__(self, data: Dict) -> Dict:
        from PIL import Image

        size = self.size
        if isinstance(size, (list, tuple)):
            size = size[0]
        frames = []
        for frame in data["video"]:
            pil = Image.fromarray((np.asarray(frame) * 255).astype(np.uint8))
            frames.append(np.asarray(pil.resize((size, size)), np.float32) / 255.0)
        data["video"] = np.stack(frames)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="video_random_crop", type="video")
class VideoRandomCrop(BaseTransformation):
    """One crop window shared by all frames (temporal consistency)."""

    def __init__(self, opts, size=None, **kwargs) -> None:
        super().__init__(opts)
        self.size = size

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--video-augmentation.random-crop.enable",
                           action="store_true", default=False)
        return parser

    def __call__(self, data: Dict) -> Dict:
        v = np.asarray(data["video"])
        t, h, w, c = v.shape
        size = self.size or data.get("crop_size") or (h, w)
        ch, cw = size if isinstance(size, (tuple, list)) else (size, size)
        ch, cw = min(ch, h), min(cw, w)
        i = random.randint(0, h - ch)
        j = random.randint(0, w - cw)
        data["video"] = v[:, i: i + ch, j: j + cw]
        return data


@TRANSFORMATIONS_REGISTRY.register(name="video_random_horizontal_flip", type="video")
class VideoRandomHorizontalFlip(BaseTransformation):
    def __init__(self, opts, p: float = 0.5, **kwargs) -> None:
        super().__init__(opts)
        self.p = p

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--video-augmentation.random-horizontal-flip.enable",
                           action="store_true", default=False)
        return parser

    def __call__(self, data: Dict) -> Dict:
        if random.random() < self.p:
            data["video"] = np.ascontiguousarray(
                np.asarray(data["video"])[:, :, ::-1])
        return data
