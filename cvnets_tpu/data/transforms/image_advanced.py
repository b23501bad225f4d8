"""Host-tier image transforms, part 2 (parity: reference data/transforms/image_pil.py
— the policy/LSJ subset): scale_jitter + fixed_size_crop (Large Scale Jittering for
the Mask R-CNN recipe, reference :209-416), AutoAugment (:507), timm-style
RandAugment (:2144), random_rotate (:796), random_resize (:1453), host
random_erasing (:1693), random_gaussian_blur (:1735), random_order (:2097),
box_percent_coords (:1360), instance_processor (:1384).

Policy tables follow the published AutoAugment IMAGENET policy; the timm-style
RandAugment reimplements the ``rand-mN-mstdS[-incI]`` config grammar natively
(timm is not a dependency).
"""

from __future__ import annotations

import argparse
import math
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from cvnets_tpu.data.transforms import TRANSFORMATIONS_REGISTRY
from cvnets_tpu.data.transforms.common import BaseTransformation
from cvnets_tpu.data.transforms.image import _PIL_INTERP, _to_pil
from cvnets_tpu.utils import logger

try:
    from PIL import Image, ImageEnhance, ImageFilter, ImageOps
except ImportError:  # pragma: no cover
    Image = None


def _setup_size(size, default=None):
    if size is None:
        return default
    if isinstance(size, int):
        return (size, size)
    if isinstance(size, (list, tuple)):
        if len(size) == 1:
            return (int(size[0]), int(size[0]))
        return (int(size[0]), int(size[1]))
    raise ValueError(f"bad size {size}")


# ------------------------------------------------------- shared geometry fns
# (reference image_pil.py:38-207 _crop_fn/_resize_fn/_pad_fn — dict-aware ops
# over image / mask / instance_mask / box_coordinates / box_labels)


def crop_data(data: Dict, top: int, left: int, height: int, width: int) -> Dict:
    img = _to_pil(data["image"])
    data["image"] = img.crop((left, top, left + width, top + height))
    if "box_coordinates" in data:
        boxes = np.asarray(data.pop("box_coordinates"), np.float32).copy()
        boxes[..., 0::2] = np.clip(boxes[..., 0::2] - left, 0, width)
        boxes[..., 1::2] = np.clip(boxes[..., 1::2] - top, 0, height)
        keep = (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])
        data["box_coordinates"] = boxes[keep]
        if "box_labels" in data:
            data["box_labels"] = np.asarray(data.pop("box_labels"))[keep]
        if "instance_mask" in data:
            im = np.asarray(data.pop("instance_mask"))[keep]
            data["instance_mask"] = _crop_pad_nhw(im, top, left, height, width)
    elif "instance_mask" in data:
        im = np.asarray(data.pop("instance_mask"))
        data["instance_mask"] = _crop_pad_nhw(im, top, left, height, width)
    if "mask" in data and data["mask"] is not None:
        m = np.asarray(data["mask"])
        data["mask"] = _crop_pad_nhw(m[None], top, left, height, width)[0]
    return data


def _crop_pad_nhw(arr: np.ndarray, top: int, left: int, height: int, width: int
                  ) -> np.ndarray:
    """Crop (N, H, W) with zero padding when the window exceeds the array."""
    n, h, w = arr.shape
    out = np.zeros((n, height, width), arr.dtype)
    t0, l0 = max(top, 0), max(left, 0)
    b0, r0 = min(top + height, h), min(left + width, w)
    if b0 > t0 and r0 > l0:
        out[:, t0 - top: b0 - top, l0 - left: r0 - left] = arr[:, t0:b0, l0:r0]
    return out


def resize_data(data: Dict, size_hw: Tuple[int, int],
                interpolation: str = "bilinear") -> Dict:
    img = _to_pil(data["image"])
    ow, oh = img.size
    nh, nw = size_hw
    data["image"] = img.resize((nw, nh), _PIL_INTERP.get(interpolation, 1))
    if "box_coordinates" in data:
        boxes = np.asarray(data.pop("box_coordinates"), np.float32).copy()
        boxes[..., 0::2] *= nw / max(ow, 1)
        boxes[..., 1::2] *= nh / max(oh, 1)
        data["box_coordinates"] = boxes
    if "mask" in data and data["mask"] is not None:
        m = _to_pil(np.asarray(data["mask"]).astype(np.uint8))
        data["mask"] = np.asarray(m.resize((nw, nh), Image.NEAREST))
    if "instance_mask" in data:
        im = np.asarray(data.pop("instance_mask"))
        out = np.stack([
            np.asarray(_to_pil(x.astype(np.uint8)).resize((nw, nh), Image.NEAREST))
            for x in im
        ]) if im.shape[0] else np.zeros((0, nh, nw), im.dtype)
        data["instance_mask"] = out
    return data


def pad_data(data: Dict, padding: Sequence[int], fill: int = 0) -> Dict:
    """padding = [left, top, right, bottom] (torchvision convention)."""
    left, top, right, bottom = padding
    img = np.asarray(_to_pil(data["image"]))
    img = np.pad(img, ((top, bottom), (left, right), (0, 0)),
                 constant_values=fill)
    data["image"] = Image.fromarray(img)
    if "box_coordinates" in data:
        boxes = np.asarray(data.pop("box_coordinates"), np.float32).copy()
        boxes[..., 0::2] += left
        boxes[..., 1::2] += top
        data["box_coordinates"] = boxes
    if "mask" in data and data["mask"] is not None:
        data["mask"] = np.pad(np.asarray(data["mask"]),
                              ((top, bottom), (left, right)),
                              constant_values=fill)
    if "instance_mask" in data:
        im = np.asarray(data.pop("instance_mask"))
        data["instance_mask"] = np.pad(
            im, ((0, 0), (top, bottom), (left, right)), constant_values=0)
    return data


# ----------------------------------------------------------------- LSJ pair


@TRANSFORMATIONS_REGISTRY.register(name="scale_jitter", type="image_pil")
class ScaleJitter(BaseTransformation):
    """Random rescale within scale_range of the target fit (reference :304;
    Large Scale Jitter, https://arxiv.org/abs/2012.07177)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.target_size = _setup_size(getattr(
            opts, "image_augmentation.scale_jitter.target_size", None), (1024, 1024))
        sr = getattr(opts, "image_augmentation.scale_jitter.scale_range", None) \
            or (0.1, 2.0)
        self.scale_range = tuple(sr)
        self.interpolation = getattr(
            opts, "image_augmentation.scale_jitter.interpolation", "bilinear")

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.scale-jitter.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.scale-jitter.interpolation",
                           type=str, default="bilinear")
        group.add_argument("--image-augmentation.scale-jitter.target-size",
                           type=int, nargs="+", default=None)
        group.add_argument("--image-augmentation.scale-jitter.scale-range",
                           type=float, nargs="+", default=None)
        return parser

    def __call__(self, data: Dict) -> Dict:
        img = _to_pil(data["image"])
        ow, oh = img.size
        scale = self.scale_range[0] + random.random() * (
            self.scale_range[1] - self.scale_range[0])
        # reference :393-399 (note its target indexing quirk kept verbatim:
        # min(target[1]/h, target[0]/w))
        r = min(self.target_size[1] / oh, self.target_size[0] / ow) * scale
        return resize_data(data, (int(oh * r), int(ow * r)), self.interpolation)


@TRANSFORMATIONS_REGISTRY.register(name="fixed_size_crop", type="image_pil")
class FixedSizeCrop(BaseTransformation):
    """Random crop to a fixed size, zero-padding when smaller (reference :209)."""

    def __init__(self, opts, size=None, **kwargs) -> None:
        super().__init__(opts)
        if size is None:
            size = getattr(opts, "image_augmentation.fixed_size_crop.size", None)
        size = _setup_size(size, (1024, 1024))
        self.crop_height, self.crop_width = size
        self.fill = getattr(opts, "image_augmentation.fixed_size_crop.fill", 0)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.fixed-size-crop.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.fixed-size-crop.size",
                           type=int, nargs="+", default=None)
        group.add_argument("--image-augmentation.fixed-size-crop.fill",
                           type=int, default=0)
        group.add_argument("--image-augmentation.fixed-size-crop.padding-mode",
                           type=str, default="constant")
        return parser

    def __call__(self, data: Dict) -> Dict:
        img = _to_pil(data["image"])
        width, height = img.size
        new_h = min(height, self.crop_height)
        new_w = min(width, self.crop_width)
        if new_h != height or new_w != width:
            r = random.random()
            top = int(max(height - self.crop_height, 0) * r)
            left = int(max(width - self.crop_width, 0) * r)
            data = crop_data(data, top, left, new_h, new_w)
        pad_bottom = max(self.crop_height - new_h, 0)
        pad_right = max(self.crop_width - new_w, 0)
        if pad_bottom or pad_right:
            data = pad_data(data, [0, 0, pad_right, pad_bottom], self.fill)
        return data


# ------------------------------------------------------------ PIL op table
# shared by AutoAugment / RandAugmentTimm; magnitudes follow the published
# AutoAugment/RandAugment conventions (10 magnitude bins)


_PIL_GEOM_INTERP = {"nearest": Image.NEAREST, "bilinear": Image.BILINEAR,
                    "bicubic": Image.BICUBIC}


def _affine(img, matrix, interpolation: str = "bilinear"):
    return img.transform(img.size, Image.AFFINE, matrix,
                         resample=_PIL_GEOM_INTERP.get(interpolation,
                                                       Image.BILINEAR),
                         fillcolor=(128, 128, 128))


def _apply_pil_op(img, op: str, magnitude: float,
                  interpolation: str = "bilinear"):
    """magnitude is the op-specific signed value (already scaled)."""
    if op == "ShearX":
        return _affine(img, (1, magnitude, 0, 0, 1, 0), interpolation)
    if op == "ShearY":
        return _affine(img, (1, 0, 0, magnitude, 1, 0), interpolation)
    if op == "TranslateX":
        return _affine(img, (1, 0, magnitude * img.size[0], 0, 1, 0),
                       interpolation)
    if op == "TranslateY":
        return _affine(img, (1, 0, 0, 0, 1, magnitude * img.size[1]),
                       interpolation)
    if op == "Rotate":
        return img.rotate(magnitude,
                          resample=_PIL_GEOM_INTERP.get(interpolation,
                                                        Image.BILINEAR),
                          fillcolor=(128, 128, 128))
    if op == "Brightness":
        return ImageEnhance.Brightness(img).enhance(1.0 + magnitude)
    if op == "Color":
        return ImageEnhance.Color(img).enhance(1.0 + magnitude)
    if op == "Contrast":
        return ImageEnhance.Contrast(img).enhance(1.0 + magnitude)
    if op == "Sharpness":
        return ImageEnhance.Sharpness(img).enhance(1.0 + magnitude)
    if op == "Posterize":
        return ImageOps.posterize(img, max(1, int(magnitude)))
    if op == "Solarize":
        return ImageOps.solarize(img, int(magnitude))
    if op == "SolarizeAdd":
        arr = np.asarray(img).astype(np.int32)
        arr = np.where(arr < 128, np.clip(arr + int(magnitude), 0, 255), arr)
        return Image.fromarray(arr.astype(np.uint8))
    if op == "AutoContrast":
        return ImageOps.autocontrast(img)
    if op == "Equalize":
        return ImageOps.equalize(img)
    if op == "Invert":
        return ImageOps.invert(img)
    raise ValueError(f"unknown op {op}")


_SIGNED_OPS = {"ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate",
               "Brightness", "Color", "Contrast", "Sharpness"}


def _aa_magnitude(op: str, mag_idx: Optional[int]) -> float:
    """AutoAugment 10-bin magnitude table (torchvision convention)."""
    if mag_idx is None:
        return 0.0
    t = mag_idx / 9.0
    if op in ("ShearX", "ShearY"):
        return 0.3 * mag_idx / 9.0
    if op in ("TranslateX", "TranslateY"):
        return (150.0 / 331.0) * t
    if op == "Rotate":
        return 30.0 * t
    if op in ("Brightness", "Color", "Contrast", "Sharpness"):
        return 0.9 * t
    if op == "Posterize":
        return 8 - int(np.round(t * 4))
    if op == "Solarize":
        return 255.0 * (1.0 - t)
    return 0.0


# The published AutoAugment ImageNet policy (Cubuk et al. 2019, table used by
# torchvision AutoAugmentPolicy.IMAGENET): 25 (op, p, magnitude_idx) pairs.
_IMAGENET_POLICY = [
    (("Posterize", 0.4, 8), ("Rotate", 0.6, 9)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, None)),
    (("Equalize", 0.8, None), ("Equalize", 0.6, None)),
    (("Posterize", 0.6, 7), ("Posterize", 0.6, 6)),
    (("Equalize", 0.4, None), ("Solarize", 0.2, 4)),
    (("Equalize", 0.4, None), ("Rotate", 0.8, 8)),
    (("Solarize", 0.6, 3), ("Equalize", 0.6, None)),
    (("Posterize", 0.8, 5), ("Equalize", 1.0, None)),
    (("Rotate", 0.2, 3), ("Solarize", 0.6, 8)),
    (("Equalize", 0.6, None), ("Posterize", 0.4, 6)),
    (("Rotate", 0.8, 8), ("Color", 0.4, 0)),
    (("Rotate", 0.4, 9), ("Equalize", 0.6, None)),
    (("Equalize", 0.0, None), ("Equalize", 0.8, None)),
    (("Invert", 0.6, None), ("Equalize", 1.0, None)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Rotate", 0.8, 8), ("Color", 1.0, 2)),
    (("Color", 0.8, 8), ("Solarize", 0.8, 7)),
    (("Sharpness", 0.4, 7), ("Invert", 0.6, None)),
    (("ShearX", 0.6, 5), ("Equalize", 1.0, None)),
    (("Color", 0.4, 0), ("Equalize", 0.6, None)),
    (("Equalize", 0.4, None), ("Solarize", 0.2, 4)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, None)),
    (("Invert", 0.6, None), ("Equalize", 1.0, None)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Equalize", 0.8, None), ("Equalize", 0.6, None)),
]


@TRANSFORMATIONS_REGISTRY.register(name="auto_augment", type="image_pil")
class AutoAugment(BaseTransformation):
    """True AutoAugment ImageNet policy (reference image_pil.py:507 wraps
    torchvision; this is a native PIL implementation of the same policy)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        policy = getattr(opts, "image_augmentation.auto_augment.policy", "imagenet")
        if policy != "imagenet":
            logger.error(f"auto_augment: unsupported policy {policy}")
        self.policy = _IMAGENET_POLICY
        self.interpolation = getattr(
            opts, "image_augmentation.auto_augment.interpolation", "bilinear")

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.auto-augment.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.auto-augment.policy",
                           type=str, default="imagenet")
        group.add_argument("--image-augmentation.auto-augment.interpolation",
                           type=str, default="bilinear")
        return parser

    def __call__(self, data: Dict) -> Dict:
        if "box_coordinates" in data or "mask" in data:
            logger.error("auto_augment supports classification data only")
        img = _to_pil(data["image"])
        for op, p, mag_idx in random.choice(self.policy):
            if random.random() <= p:
                mag = _aa_magnitude(op, mag_idx)
                if op in _SIGNED_OPS and random.random() < 0.5:
                    mag = -mag
                img = _apply_pil_op(img, op, mag, self.interpolation)
        data["image"] = img
        return data


_TIMM_RAND_OPS_INC = [
    "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize", "Solarize",
    "SolarizeAdd", "Color", "Contrast", "Brightness", "Sharpness",
    "ShearX", "ShearY", "TranslateX", "TranslateY",
]


@TRANSFORMATIONS_REGISTRY.register(name="rand_augment_timm", type="image_pil")
class RandAugmentTimm(BaseTransformation):
    """timm-style RandAugment, ``rand-mN-mstdS[-incI]`` config grammar
    (reference image_pil.py:2144 delegates to timm; native reimplementation —
    magnitude sampled N(m, mstd) per op, clipped to [0, 10])."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.config_str = getattr(
            opts, "image_augmentation.rand_augment.timm_config_str",
            "rand-m9-mstd0.5-inc1")
        self.m, self.mstd, self.n = 9.0, 0.5, 2
        for part in self.config_str.split("-")[1:]:
            if part.startswith("mstd"):
                self.mstd = float(part[4:])
            elif part.startswith("m"):
                self.m = float(part[1:])
            elif part.startswith("n"):
                self.n = int(part[1:])
            # incX: increasing-magnitude variants; our table is already the
            # increasing set

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.rand-augment.use-timm-library",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.rand-augment.timm-config-str",
                           type=str, default="rand-m9-mstd0.5-inc1")
        return parser

    def _magnitude(self, op: str) -> float:
        m = self.m
        if self.mstd > 0:
            m = random.gauss(self.m, self.mstd)
        m = max(0.0, min(10.0, m))
        t = m / 10.0
        if op in ("ShearX", "ShearY"):
            return 0.3 * t
        if op in ("TranslateX", "TranslateY"):
            return 0.45 * t  # timm translate_pct
        if op == "Rotate":
            return 30.0 * t
        if op in ("Brightness", "Color", "Contrast", "Sharpness"):
            return 0.9 * t
        if op == "Posterize":
            return 4 + int(np.round((1.0 - t) * 4))  # increasing: more bits kept at low m
        if op == "Solarize":
            return 255.0 * (1.0 - t)
        if op == "SolarizeAdd":
            return 110.0 * t
        return 0.0

    def __call__(self, data: Dict) -> Dict:
        if "box_coordinates" in data or "mask" in data:
            logger.error("rand_augment_timm supports classification data only")
        img = _to_pil(data["image"])
        for op in random.choices(_TIMM_RAND_OPS_INC, k=self.n):
            mag = self._magnitude(op)
            if op in _SIGNED_OPS and random.random() < 0.5:
                mag = -mag
            img = _apply_pil_op(img, op, mag)
        data["image"] = img
        return data


# -------------------------------------------------------------- misc ops


@TRANSFORMATIONS_REGISTRY.register(name="random_rotate", type="image_pil")
class RandomRotate(BaseTransformation):
    """Uniform rotation in [-angle, angle]; image bilinear, mask nearest
    (reference :796)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.angle = getattr(opts, "image_augmentation.random_rotate.angle", 10.0)
        self.mask_fill = getattr(opts, "image_augmentation.random_rotate.mask_fill", 0)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.random-rotate.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.random-rotate.angle",
                           type=float, default=10.0)
        group.add_argument("--image-augmentation.random-rotate.mask-fill",
                           type=int, default=0)
        return parser

    def __call__(self, data: Dict) -> Dict:
        if "box_coordinates" in data or "instance_mask" in data:
            logger.error("random_rotate supports images and masks only")
        angle = random.uniform(-self.angle, self.angle)
        img = _to_pil(data["image"])
        data["image"] = img.rotate(angle, resample=Image.BILINEAR, fillcolor=0)
        if "mask" in data and data["mask"] is not None:
            m = _to_pil(np.asarray(data["mask"]).astype(np.uint8))
            data["mask"] = np.asarray(
                m.rotate(angle, resample=Image.NEAREST,
                         fillcolor=self.mask_fill))
        return data


@TRANSFORMATIONS_REGISTRY.register(name="random_resize", type="image_pil")
class RandomResize(BaseTransformation):
    """Resize by a uniform ratio in [min_ratio, max_ratio], optionally capped by
    max edge scales (reference :1453)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.min_ratio = getattr(opts, "image_augmentation.random_resize.min_ratio", 0.5)
        self.max_ratio = getattr(opts, "image_augmentation.random_resize.max_ratio", 2.0)
        self.interpolation = getattr(
            opts, "image_augmentation.random_resize.interpolation", "bilinear")
        self.max_long = getattr(
            opts, "image_augmentation.random_resize.max_scale_long_edge", None)
        self.max_short = getattr(
            opts, "image_augmentation.random_resize.max_scale_short_edge", None)
        if (self.max_long is None) != (self.max_short is None):
            self.max_long = self.max_short = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.random-resize.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.random-resize.min-ratio",
                           type=float, default=0.5)
        group.add_argument("--image-augmentation.random-resize.max-ratio",
                           type=float, default=2.0)
        group.add_argument("--image-augmentation.random-resize.interpolation",
                           type=str, default="bilinear")
        group.add_argument("--image-augmentation.random-resize.max-scale-long-edge",
                           type=int, default=None)
        group.add_argument("--image-augmentation.random-resize.max-scale-short-edge",
                           type=int, default=None)
        return parser

    def __call__(self, data: Dict) -> Dict:
        img = _to_pil(data["image"])
        ow, oh = img.size
        ratio = random.uniform(self.min_ratio, self.max_ratio)
        if self.max_long is not None:
            # cap the scale so long/short edges stay within bounds
            # (reference :1536-1545)
            min_edge, max_edge = min(oh, ow), max(oh, ow)
            ratio = min(ratio, self.max_short / min_edge,
                        self.max_long / max_edge)
        return resize_data(data, (int(oh * ratio), int(ow * ratio)),
                           self.interpolation)


@TRANSFORMATIONS_REGISTRY.register(name="random_erasing", type="image_pil")
class RandomErasing(BaseTransformation):
    """Host-tier random erasing on array images (reference :1693 wraps
    torchvision RandomErasing; same scale/ratio defaults). A batched device-tier
    variant lives in ops/image_ops.py."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.p = getattr(opts, "image_augmentation.random_erase.p", 0.5)
        self.scale = (0.02, 0.33)
        self.ratio = (0.3, 3.3)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.random-erase.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.random-erase.p",
                           type=float, default=0.5)
        return parser

    def __call__(self, data: Dict) -> Dict:
        if random.random() >= self.p:
            return data
        arr = np.array(_to_pil(data["image"]))
        h, w = arr.shape[:2]
        area = h * w
        for _ in range(10):
            target = area * random.uniform(*self.scale)
            aspect = math.exp(random.uniform(*map(math.log, self.ratio)))
            eh = int(round(math.sqrt(target * aspect)))
            ew = int(round(math.sqrt(target / aspect)))
            if eh < h and ew < w:
                i = random.randint(0, h - eh)
                j = random.randint(0, w - ew)
                arr[i:i + eh, j:j + ew] = np.random.randint(
                    0, 256, (eh, ew) + arr.shape[2:], np.uint8)
                break
        data["image"] = Image.fromarray(arr)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="random_gaussian_blur", type="image_pil")
class RandomGaussianBlur(BaseTransformation):
    """Random gaussian blur with radius ~ U(0, 1) (reference :1735)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.p = getattr(opts, "image_augmentation.random_gaussian_noise.p", 0.5)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.random-gaussian-noise.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.random-gaussian-noise.p",
                           type=float, default=0.5)
        return parser

    def __call__(self, data: Dict) -> Dict:
        if random.random() < self.p:
            img = _to_pil(data["image"])
            data["image"] = img.filter(
                ImageFilter.GaussianBlur(radius=random.random()))
        return data


@TRANSFORMATIONS_REGISTRY.register(name="random_order", type="image_pil")
class RandomOrder(BaseTransformation):
    """Apply ceil(k * len) of the given transforms in random order
    (reference :2097)."""

    def __init__(self, opts, img_transforms: Optional[List] = None, **kwargs) -> None:
        super().__init__(opts)
        self.transforms = list(img_transforms or [])
        k = getattr(opts, "image_augmentation.random_order.apply_k", 1.0) or 1.0
        self.keep_t = int(math.ceil(len(self.transforms) * float(k)))

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.random-order.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.random-order.apply-k",
                           type=float, default=1.0)
        return parser

    def __call__(self, data: Dict) -> Dict:
        order = list(self.transforms)
        random.shuffle(order)
        for t in order[: self.keep_t]:
            data = t(data)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="box_percent_coords", type="image_pil")
class BoxPercentCoords(BaseTransformation):
    """Convert absolute xyxy boxes to [0, 1] percent coords (reference :1360)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)

    def __call__(self, data: Dict) -> Dict:
        if "box_coordinates" in data:
            img = _to_pil(data["image"])
            w, h = img.size
            boxes = np.asarray(data.pop("box_coordinates"), np.float32).copy()
            boxes[..., 0::2] /= max(w, 1)
            boxes[..., 1::2] /= max(h, 1)
            data["box_coordinates"] = boxes
        return data


@TRANSFORMATIONS_REGISTRY.register(name="instance_processor", type="image_pil")
class InstanceProcessor(BaseTransformation):
    """Crop each instance mask to its box and resize to instance_size
    (reference :1384)."""

    def __init__(self, opts, instance_size=16, **kwargs) -> None:
        super().__init__(opts)
        self.instance_size = _setup_size(instance_size, (16, 16))

    def __call__(self, data: Dict) -> Dict:
        if "instance_mask" not in data:
            return data
        assert "instance_coords" in data, "instance_processor needs instance_coords"
        masks = np.asarray(data.pop("instance_mask"))
        coords = np.asarray(data.pop("instance_coords")).astype(np.int64)
        valid = (coords[..., 3] > coords[..., 1]) & (coords[..., 2] > coords[..., 0])
        masks, coords = masks[valid], coords[valid]
        out = []
        ih, iw = self.instance_size
        for m, box in zip(masks, coords):
            crop = _crop_pad_nhw(m[None], box[1], box[0],
                                 max(box[3] - box[1], 1),
                                 max(box[2] - box[0], 1))[0]
            pil = _to_pil(crop.astype(np.uint8))
            out.append(np.asarray(pil.resize((iw, ih), Image.NEAREST)))
        if not out:
            out = [np.zeros((ih, iw), np.int64)]
            coords = np.array([[0, 0, iw, ih]])
        data["instance_mask"] = np.stack(out).astype(np.int64)
        data["instance_coords"] = coords.astype(np.float32)
        return data


_TORCHVISION_RA_OPS = [
    "Identity", "ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate",
    "Brightness", "Color", "Contrast", "Sharpness", "Posterize", "Solarize",
    "AutoContrast", "Equalize",
]


@TRANSFORMATIONS_REGISTRY.register(name="rand_augment", type="image_pil")
class RandAugmentPIL(BaseTransformation):
    """Host-tier (PIL) RandAugment, torchvision op set/magnitudes (reference
    image_pil.py:575). The batched device-tier variant in ops/image_ops.py is
    preferred for TPU throughput; this one exists for pipelines that must
    augment before byte-encoding (ByteFormer) or on the host."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.n = int(getattr(opts, "image_augmentation.rand_augment.n", 2) or 2)
        self.m = int(getattr(opts, "image_augmentation.rand_augment.m", 9) or 9)
        # apply-probability and geometric-op filter (reference
        # image_pil.py:575 RandAugment flags)
        self.p = float(getattr(opts, "image_augmentation.rand_augment.p", 1.0)
                       if getattr(opts, "image_augmentation.rand_augment.p",
                                  None) is not None else 1.0)
        self.interpolation = getattr(
            opts, "image_augmentation.rand_augment.interpolation", "bilinear")

    def __call__(self, data: Dict) -> Dict:
        if self.p < 1.0 and random.random() > self.p:
            return data
        img = _to_pil(data["image"])
        for op in random.choices(_TORCHVISION_RA_OPS, k=self.n):
            if op == "Identity":
                continue
            mag = _aa_magnitude(op, self.m)
            if op in _SIGNED_OPS and random.random() < 0.5:
                mag = -mag
            img = _apply_pil_op(img, op, mag, self.interpolation)
        data["image"] = img
        return data


@TRANSFORMATIONS_REGISTRY.register(name="trivial_augment_wide", type="image_pil")
class TrivialAugmentWidePIL(BaseTransformation):
    """Host-tier TrivialAugmentWide (reference image_pil.py:664): ONE random op
    with magnitude uniform over the widened range."""

    _WIDE = {
        "ShearX": 0.99, "ShearY": 0.99, "TranslateX": 32.0 / 331.0,
        "TranslateY": 32.0 / 331.0, "Rotate": 135.0, "Brightness": 0.99,
        "Color": 0.99, "Contrast": 0.99, "Sharpness": 0.99,
    }

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        # torchvision discretizes magnitudes into num_magnitude_bins
        # (reference image_pil.py:664 forwards the flag to torchvision)
        self.bins = int(getattr(
            opts,
            "image_augmentation.trivial_augment_wide.num_magnitude_bins", 31)
            or 31)
        self.interpolation = getattr(
            opts, "image_augmentation.trivial_augment_wide.interpolation",
            "bilinear")

    def __call__(self, data: Dict) -> Dict:
        img = _to_pil(data["image"])
        op = random.choice(_TORCHVISION_RA_OPS)
        if op != "Identity":
            idx = random.randint(0, self.bins - 1)
            frac = idx / max(self.bins - 1, 1)
            if op in self._WIDE:
                mag = self._WIDE[op] * frac
                if op in _SIGNED_OPS and random.random() < 0.5:
                    mag = -mag
            elif op == "Posterize":
                mag = 8 - int(round(6 * frac))
            elif op == "Solarize":
                mag = 255.0 * (1.0 - frac)
            else:
                mag = 0.0
            img = _apply_pil_op(img, op, mag, self.interpolation)
        data["image"] = img
        return data
