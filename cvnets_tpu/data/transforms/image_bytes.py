"""Byte-domain transforms for ByteFormer (parity: reference
data/transforms/image_bytes.py:395 — PILSave, ShuffleBytes, BytePermutation,
MaskPositions, RandomUniformNoise)."""

from __future__ import annotations

import argparse
import io
from typing import Dict

import numpy as np

from cvnets_tpu.data.transforms import TRANSFORMATIONS_REGISTRY
from cvnets_tpu.data.transforms.common import BaseTransformation

# Fixed seed with a balanced bit pattern so the byte permutation / mask pattern
# is identical across every worker and run (reference image_bytes.py:248,301).
_FIXED_SEED = 2147483647


@TRANSFORMATIONS_REGISTRY.register(name="pil_save", type="image_bytes")
class PILSave(BaseTransformation):
    """Encode the image to file bytes (JPEG/PNG/TIFF) — the ByteFormer input
    (reference image_bytes.py:58-128)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.file_encoding = (
            getattr(opts, "image_augmentation.pil_save.file_encoding", None)
            or getattr(opts, "image_augmentation.pil_save.encoding", "jpeg")
            or "jpeg")
        self.quality = getattr(opts, "image_augmentation.pil_save.quality", 100)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.pil-save.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.pil-save.file-encoding", type=str,
                           default=None,
                           help="Reference flag name (image_bytes.py); wins "
                                "over --image-augmentation.pil-save.encoding")
        group.add_argument("--image-augmentation.pil-save.encoding", type=str,
                           default="jpeg",
                           choices=["jpeg", "png", "tiff", "fcam",
                                    "fCHW", "fHWC", "JPEG", "PNG", "TIFF"])
        group.add_argument("--image-augmentation.pil-save.quality", type=int,
                           default=100)
        return parser

    def __call__(self, data: Dict) -> Dict:
        from cvnets_tpu.data.transforms.image import _to_pil

        img = _to_pil(data["image"])
        fmt = self.file_encoding.upper()
        if fmt in ("FCHW", "FHWC"):
            # raw pixel-tensor "encodings" (reference image_bytes.py:84-87):
            # uint8 pixels flattened channel-first / channel-last
            arr = np.asarray(img, np.uint8)
            if fmt == "FCHW":
                arr = arr.transpose(2, 0, 1)
            data["image"] = arr.reshape(-1).astype(np.int32)
            return data
        buf = io.BytesIO()
        if fmt == "JPEG":
            img.save(buf, format="JPEG", quality=self.quality)
        elif fmt == "PNG":
            img.save(buf, format="PNG", compress_level=0)
        else:
            img.save(buf, format=fmt)
        data["image"] = np.frombuffer(buf.getvalue(), np.uint8).astype(np.int32)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="shuffle_bytes", type="image_bytes")
class ShuffleBytes(BaseTransformation):
    """Reorder a 1-D byte buffer (reference image_bytes.py:131-228).

    Modes: ``reverse`` flips the buffer; ``random_shuffle`` draws a fresh random
    permutation per sample; ``cyclic_half_length`` rolls by N//2; ``stride``
    interleaves byte positions at the configured stride; ``window_shuffle``
    applies ONE fixed permutation (drawn at construction) to every full window,
    leaving the tail unshuffled.
    """

    MODES = ("reverse", "random_shuffle", "cyclic_half_length", "stride",
             "window_shuffle")

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.mode = getattr(
            opts, "image_augmentation.shuffle_bytes.mode", "reverse") or "reverse"
        self.stride = getattr(
            opts, "image_augmentation.shuffle_bytes.stride", 1024)
        window_size = getattr(
            opts, "image_augmentation.shuffle_bytes.window_size", 1024)
        # the window permutation is fixed across samples (reference :141)
        self.window_shuffle = np.random.default_rng(
            _FIXED_SEED).permutation(window_size)

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.shuffle-bytes.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.shuffle-bytes.mode", type=str,
                           default="reverse", choices=list(cls.MODES))
        group.add_argument("--image-augmentation.shuffle-bytes.stride",
                           type=int, default=1024)
        group.add_argument("--image-augmentation.shuffle-bytes.window-size",
                           type=int, default=1024)
        return parser

    def __call__(self, data: Dict) -> Dict:
        x = np.asarray(data["image"]).reshape(-1)
        n = x.shape[0]
        if self.mode == "reverse":
            x = x[::-1]
        elif self.mode == "random_shuffle":
            x = np.random.permutation(x)
        elif self.mode == "cyclic_half_length":
            x = np.roll(x, n // 2)
        elif self.mode == "stride":
            x = np.concatenate([x[i::self.stride] for i in range(self.stride)])
        elif self.mode == "window_shuffle":
            w = self.window_shuffle.shape[0]
            num_windows = n // w
            if num_windows:
                head = x[: num_windows * w].reshape(num_windows, w)
                x = np.concatenate(
                    [head[:, self.window_shuffle].reshape(-1),
                     x[num_windows * w:]])
        else:
            raise NotImplementedError(
                f"shuffle_bytes mode={self.mode}; expected one of {self.MODES}")
        data["image"] = np.ascontiguousarray(x)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="byte_permutation", type="image_bytes")
class BytePermutation(BaseTransformation):
    """Fixed remap of byte values through a seeded permutation of [0, 256)
    (privacy obfuscation; reference image_bytes.py:292-336)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.mapping = np.random.default_rng(_FIXED_SEED).permutation(256)

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.byte-permutation.enable",
                           action="store_true", default=False)
        return parser

    def __call__(self, data: Dict) -> Dict:
        arr = np.asarray(data["image"]).astype(np.int64)
        valid = arr >= 0  # negative values are padding added downstream
        out = arr.copy()
        out[valid] = self.mapping[arr[valid] % 256]
        data["image"] = out.astype(np.int32)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="mask_positions", type="image_bytes")
class MaskPositions(BaseTransformation):
    """Subsample byte positions with a FIXED keep pattern: keep ``keep_frac`` of
    positions (chosen once from a fixed seed, shared by all samples of that
    length) and drop the rest — the privacy-preserving-camera input model
    (reference image_bytes.py:231-289)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.keep_frac = getattr(
            opts, "image_augmentation.mask_positions.keep_frac", 0.25)
        self._cached_mask = None

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.mask-positions.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.mask-positions.keep-frac",
                           type=float, default=0.25)
        return parser

    def _mask_for(self, n: int) -> np.ndarray:
        # the mask is fixed across all inputs (reference :241-251); cache per
        # length since raw byte streams vary in size
        if self._cached_mask is None or self._cached_mask.shape[0] != n:
            rng = np.random.default_rng(_FIXED_SEED)
            mask = np.zeros(n, dtype=bool)
            mask[rng.permutation(n)[: int(self.keep_frac * n)]] = True
            self._cached_mask = mask
        return self._cached_mask

    def __call__(self, data: Dict) -> Dict:
        x = np.asarray(data["image"]).reshape(-1)
        data["image"] = np.ascontiguousarray(x[self._mask_for(x.shape[0])])
        return data


@TRANSFORMATIONS_REGISTRY.register(name="random_uniform", type="image_bytes")
class RandomUniformNoise(BaseTransformation):
    """Add uniform integer noise in ``width_range`` (inclusive) to byte values,
    wrapping mod 256 (obfuscation experiments; reference image_bytes.py:339-396)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        rng = getattr(opts, "image_augmentation.random_uniform.width_range",
                      [-5, 5]) or [-5, 5]
        self.low, self.high = int(rng[0]), int(rng[1])

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.random-uniform.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.random-uniform.width-range",
                           type=int, nargs=2, default=[-5, 5])
        return parser

    def __call__(self, data: Dict) -> Dict:
        arr = np.asarray(data["image"]).astype(np.int32)
        noise = np.random.randint(self.low, self.high + 1, arr.shape)
        valid = arr >= 0  # don't perturb padding
        arr = np.where(valid, (arr + noise) % 256, arr)
        data["image"] = arr
        return data
