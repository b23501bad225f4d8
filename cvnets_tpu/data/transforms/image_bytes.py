"""Byte-domain transforms for ByteFormer (parity: reference
data/transforms/image_bytes.py:395 — PILSave, ShuffleBytes, BytePermutation,
MaskPositions, RandomUniformNoise)."""

from __future__ import annotations

import argparse
import io
import random
from typing import Dict

import numpy as np

from cvnets_tpu.data.transforms import TRANSFORMATIONS_REGISTRY
from cvnets_tpu.data.transforms.common import BaseTransformation


@TRANSFORMATIONS_REGISTRY.register(name="pil_save", type="image_bytes")
class PILSave(BaseTransformation):
    """Encode the image to file bytes (JPEG/PNG/TIFF) — the ByteFormer input
    (reference image_bytes.py PILSave)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.file_encoding = getattr(
            opts, "image_augmentation.pil_save.encoding", "jpeg") or "jpeg"
        self.quality = getattr(opts, "image_augmentation.pil_save.quality", 100)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.pil-save.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.pil-save.encoding", type=str,
                           default="jpeg", choices=["jpeg", "png", "tiff", "fcam"])
        group.add_argument("--image-augmentation.pil-save.quality", type=int,
                           default=100)
        return parser

    def __call__(self, data: Dict) -> Dict:
        from cvnets_tpu.data.transforms.image import _to_pil

        img = _to_pil(data["image"])
        buf = io.BytesIO()
        fmt = self.file_encoding.upper()
        if fmt == "JPEG":
            img.save(buf, format="JPEG", quality=self.quality)
        else:
            img.save(buf, format=fmt)
        data["image"] = np.frombuffer(buf.getvalue(), np.uint8).astype(np.int32)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="shuffle_bytes", type="image_bytes")
class ShuffleBytes(BaseTransformation):
    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.shuffle-bytes.enable",
                           action="store_true", default=False)
        return parser

    def __call__(self, data: Dict) -> Dict:
        arr = np.asarray(data["image"])
        data["image"] = np.random.permutation(arr)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="byte_permutation", type="image_bytes")
class BytePermutation(BaseTransformation):
    """Random fixed remap of byte values (privacy obfuscation; reference
    ByTePermutation)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        seed = getattr(opts, "common.seed", 0) or 0
        rng = np.random.default_rng(seed)
        self.mapping = rng.permutation(256)

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.byte-permutation.enable",
                           action="store_true", default=False)
        return parser

    def __call__(self, data: Dict) -> Dict:
        arr = np.asarray(data["image"]).astype(np.int64)
        valid = arr >= 0
        out = arr.copy()
        out[valid] = self.mapping[arr[valid] % 256]
        data["image"] = out.astype(np.int32)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="mask_positions", type="image_bytes")
class MaskPositions(BaseTransformation):
    """Randomly mask byte positions with the mask token (reference MaskPositions)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.p = getattr(opts, "image_augmentation.mask_positions.p", 0.1)
        self.mask_value = getattr(
            opts, "model.classification.byteformer.vocab_size", 257) - 1

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.mask-positions.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.mask-positions.p", type=float,
                           default=0.1)
        return parser

    def __call__(self, data: Dict) -> Dict:
        arr = np.asarray(data["image"]).astype(np.int32)
        mask = np.random.uniform(size=arr.shape) < self.p
        arr = np.where(mask & (arr >= 0), self.mask_value, arr)
        data["image"] = arr
        return data


@TRANSFORMATIONS_REGISTRY.register(name="random_uniform", type="image_bytes")
class RandomUniformNoise(BaseTransformation):
    """Add bounded uniform integer noise to bytes (obfuscation experiments;
    reference RandomUniform)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.low = getattr(opts, "image_augmentation.random_uniform.low", -20)
        self.high = getattr(opts, "image_augmentation.random_uniform.high", 20)

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.random-uniform.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.random-uniform.low", type=int,
                           default=-20)
        group.add_argument("--image-augmentation.random-uniform.high", type=int,
                           default=20)
        return parser

    def __call__(self, data: Dict) -> Dict:
        arr = np.asarray(data["image"]).astype(np.int32)
        noise = np.random.randint(self.low, self.high + 1, arr.shape)
        valid = arr >= 0
        arr = np.where(valid, np.clip(arr + noise, 0, 255), arr)
        data["image"] = arr
        return data
