"""Host-tier image transforms (parity: reference data/transforms/image_pil.py, the
geometry subset; photometric aug runs batched on device in ops/image_ops.py).

Ops operate on a dict with "image" as a PIL Image or HWC uint8/float numpy array and
optional "box_coordinates" (N,4 xyxy, absolute) / "mask" (HW int). Output images are
float32 HWC in [0, 1] after ToFloatTensor.
"""

from __future__ import annotations

import argparse
import math
import random
from typing import Dict, Optional, Tuple

import numpy as np

from cvnets_tpu.data.transforms import TRANSFORMATIONS_REGISTRY
from cvnets_tpu.data.transforms.common import BaseTransformation

try:
    from PIL import Image

    _PIL_INTERP = {
        "nearest": Image.NEAREST,
        "bilinear": Image.BILINEAR,
        "bicubic": Image.BICUBIC,
    }
except ImportError:  # pragma: no cover
    Image = None
    _PIL_INTERP = {}


def _to_pil(img):
    if Image is not None and isinstance(img, Image.Image):
        return img
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    return Image.fromarray(arr)


def _resize_image(img, size_hw: Tuple[int, int], interpolation: str = "bilinear"):
    pil = _to_pil(img)
    return pil.resize((size_hw[1], size_hw[0]), _PIL_INTERP.get(interpolation, 1))


@TRANSFORMATIONS_REGISTRY.register(name="random_resized_crop", type="image_pil")
class RandomResizedCrop(BaseTransformation):
    """Random scale/aspect crop then resize (reference image_pil.py:418)."""

    def __init__(self, opts, size=None, **kwargs) -> None:
        super().__init__(opts)
        self.scale = tuple(getattr(opts, "image_augmentation.random_resized_crop.scale",
                                   (0.08, 1.0)) or (0.08, 1.0))
        ratio = getattr(opts, "image_augmentation.random_resized_crop.aspect_ratio",
                        (3.0 / 4.0, 4.0 / 3.0)) or (3.0 / 4.0, 4.0 / 3.0)
        self.ratio = tuple(ratio)
        self.interpolation = getattr(
            opts, "image_augmentation.random_resized_crop.interpolation", "bilinear"
        )
        self.size = size  # (h, w); set per batch by the dataset from the sampler tuple

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.random-resized-crop.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.random-resized-crop.interpolation",
                           type=str, default="bilinear")
        group.add_argument("--image-augmentation.random-resized-crop.scale",
                           type=float, nargs="+", default=(0.08, 1.0))
        group.add_argument("--image-augmentation.random-resized-crop.aspect-ratio",
                           type=float, nargs="+", default=(3.0 / 4.0, 4.0 / 3.0))
        return parser

    def get_params(self, height: int, width: int) -> Tuple[int, int, int, int]:
        area = height * width
        log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        for _ in range(10):
            target_area = area * random.uniform(*self.scale)
            aspect = math.exp(random.uniform(*log_ratio))
            w = int(round(math.sqrt(target_area * aspect)))
            h = int(round(math.sqrt(target_area / aspect)))
            if 0 < w <= width and 0 < h <= height:
                i = random.randint(0, height - h)
                j = random.randint(0, width - w)
                return i, j, h, w
        # fallback: center crop
        in_ratio = width / height
        if in_ratio < self.ratio[0]:
            w = width
            h = int(round(w / self.ratio[0]))
        elif in_ratio > self.ratio[1]:
            h = height
            w = int(round(h * self.ratio[1]))
        else:
            w, h = width, height
        i = (height - h) // 2
        j = (width - w) // 2
        return i, j, h, w

    def __call__(self, data: Dict) -> Dict:
        img = _to_pil(data["image"])
        size = data.get("crop_size", self.size) or (img.height, img.width)
        i, j, h, w = self.get_params(img.height, img.width)
        img = img.crop((j, i, j + w, i + h)).resize(
            (size[1], size[0]), _PIL_INTERP.get(self.interpolation, 1)
        )
        data["image"] = img
        return data


@TRANSFORMATIONS_REGISTRY.register(name="random_horizontal_flip", type="image_pil")
class RandomHorizontalFlip(BaseTransformation):
    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.p = getattr(opts, "image_augmentation.random_horizontal_flip.p", 0.5)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.random-horizontal-flip.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.random-horizontal-flip.p",
                           type=float, default=0.5)
        return parser

    def __call__(self, data: Dict) -> Dict:
        if random.random() < self.p:
            img = _to_pil(data["image"])
            data["image"] = img.transpose(Image.FLIP_LEFT_RIGHT)
            if "box_coordinates" in data:
                boxes = np.array(data["box_coordinates"], dtype=np.float32)
                w = img.width
                boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
                data["box_coordinates"] = boxes
            if "mask" in data and data["mask"] is not None:
                data["mask"] = np.ascontiguousarray(np.asarray(data["mask"])[:, ::-1])
        return data


@TRANSFORMATIONS_REGISTRY.register(name="resize", type="image_pil")
class Resize(BaseTransformation):
    """Resize shorter side (int size) or to exact (h, w) (reference image_pil.py:861)."""

    def __init__(self, opts, img_size=None, **kwargs) -> None:
        super().__init__(opts)
        self.size = img_size if img_size is not None else getattr(
            opts, "image_augmentation.resize.size", 256
        )
        self.interpolation = getattr(
            opts, "image_augmentation.resize.interpolation", "bilinear"
        )

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.resize.enable", action="store_true",
                           default=False)
        group.add_argument("--image-augmentation.resize.size", type=int, nargs="+",
                           default=256)
        group.add_argument("--image-augmentation.resize.interpolation", type=str,
                           default="bilinear")
        return parser

    def __call__(self, data: Dict) -> Dict:
        img = _to_pil(data["image"])
        size = self.size
        if isinstance(size, (list, tuple)) and len(size) == 1:
            size = size[0]
        if isinstance(size, int):
            short, long = min(img.size), max(img.size)
            scale = size / short
            if img.width <= img.height:
                new_w, new_h = size, int(round(img.height * scale))
            else:
                new_w, new_h = int(round(img.width * scale)), size
        else:
            new_h, new_w = size
        old_w, old_h = img.width, img.height
        data["image"] = img.resize((new_w, new_h),
                                   _PIL_INTERP.get(self.interpolation, 1))
        if "box_coordinates" in data:
            boxes = np.array(data["box_coordinates"], dtype=np.float32)
            boxes[:, [0, 2]] *= new_w / old_w
            boxes[:, [1, 3]] *= new_h / old_h
            data["box_coordinates"] = boxes
        if "mask" in data and data["mask"] is not None:
            m = _to_pil(np.asarray(data["mask"]).astype(np.uint8))
            data["mask"] = np.asarray(m.resize((new_w, new_h), Image.NEAREST))
        return data


@TRANSFORMATIONS_REGISTRY.register(name="center_crop", type="image_pil")
class CenterCrop(BaseTransformation):
    def __init__(self, opts, size=None, **kwargs) -> None:
        super().__init__(opts)
        self.size = size if size is not None else getattr(
            opts, "image_augmentation.center_crop.size", 224
        )

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.center-crop.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.center-crop.size", type=int,
                           nargs="+", default=224)
        return parser

    def __call__(self, data: Dict) -> Dict:
        img = _to_pil(data["image"])
        size = self.size
        if isinstance(size, (list, tuple)):
            size = size[0]
        i = max(0, (img.height - size) // 2)
        j = max(0, (img.width - size) // 2)
        data["image"] = img.crop((j, i, j + size, i + size))
        if "mask" in data and data["mask"] is not None:
            data["mask"] = np.asarray(data["mask"])[i: i + size, j: j + size]
        return data


@TRANSFORMATIONS_REGISTRY.register(name="random_short_size_resize", type="image_pil")
class RandomShortSizeResize(BaseTransformation):
    """Resize shorter side to a random value in [min, max] (reference :1578)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.min_short = getattr(
            opts, "image_augmentation.random_short_size_resize.short_side_min", 256)
        self.max_short = getattr(
            opts, "image_augmentation.random_short_size_resize.short_side_max", 320)
        self.max_long = getattr(
            opts, "image_augmentation.random_short_size_resize.max_img_dim", 1024)
        self.interpolation = getattr(
            opts, "image_augmentation.random_short_size_resize.interpolation",
            "bilinear")

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument(
            "--image-augmentation.random-short-size-resize.enable",
            action="store_true", default=False)
        group.add_argument(
            "--image-augmentation.random-short-size-resize.short-side-min",
            type=int, default=256)
        group.add_argument(
            "--image-augmentation.random-short-size-resize.short-side-max",
            type=int, default=320)
        group.add_argument(
            "--image-augmentation.random-short-size-resize.max-img-dim",
            type=int, default=1024)
        group.add_argument(
            "--image-augmentation.random-short-size-resize.interpolation",
            type=str, default="bilinear")
        return parser

    def __call__(self, data: Dict) -> Dict:
        img = _to_pil(data["image"])
        short_side = random.randint(self.min_short, self.max_short)
        scale = min(short_side / min(img.size), self.max_long / max(img.size))
        new_w, new_h = int(img.width * scale), int(img.height * scale)
        data["image"] = img.resize((new_w, new_h),
                                   _PIL_INTERP.get(self.interpolation, 1))
        if "mask" in data and data["mask"] is not None:
            m = _to_pil(np.asarray(data["mask"]).astype(np.uint8))
            data["mask"] = np.asarray(m.resize((new_w, new_h), Image.NEAREST))
        return data


@TRANSFORMATIONS_REGISTRY.register(name="random_crop", type="image_pil")
class RandomCrop(BaseTransformation):
    """Random fixed-size crop with padding/label-aware resize for segmentation
    (reference image_pil.py RandomCrop)."""

    def __init__(self, opts, size=None, ignore_idx: int = 255, **kwargs) -> None:
        super().__init__(opts)
        self.size = size
        self.ignore_idx = ignore_idx

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.random-crop.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.random-crop.seg-class-max-ratio",
                           type=float, default=None)
        group.add_argument("--image-augmentation.random-crop.pad-if-needed",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.random-crop.mask-fill",
                           type=int, default=255)
        return parser

    def _fit_to_crop(self, arr, mask, ch, cw):
        """Make the image at least crop-sized: aspect-preserving resize by
        default, zero/mask-fill padding under --...random-crop.pad-if-needed
        (reference image_pil.py RandomCrop._resize_if_needed/_pad_if_needed)."""
        h, w = arr.shape[:2]
        if h >= ch and w >= cw:
            return arr, mask
        if getattr(self.opts, "image_augmentation.random_crop.pad_if_needed",
                   False):
            pad_h, pad_w = max(0, ch - h), max(0, cw - w)
            mask_fill = getattr(
                self.opts, "image_augmentation.random_crop.mask_fill", 255)
            arr = np.pad(arr, ((0, pad_h), (0, pad_w), (0, 0)))
            if mask is not None:
                mask = np.pad(mask, ((0, pad_h), (0, pad_w)),
                              constant_values=mask_fill)
            return arr, mask
        # short-side resize keeping aspect ratio (reference :_resize_if_needed)
        new_short = min(h + max(0, ch - h), w + max(0, cw - w))
        scale = new_short / min(h, w)
        nh, nw = max(ch, int(round(h * scale))), max(cw, int(round(w * scale)))
        arr = np.asarray(Image.fromarray(arr).resize((nw, nh), Image.BILINEAR))
        if mask is not None:
            mask = np.asarray(
                Image.fromarray(mask.astype(np.uint8)).resize(
                    (nw, nh), Image.NEAREST), mask.dtype)
        return arr, mask

    def __call__(self, data: Dict) -> Dict:
        img = _to_pil(data["image"])
        size = data.get("crop_size", self.size)
        if size is None:
            return data
        ch, cw = size if isinstance(size, (tuple, list)) else (size, size)
        arr = np.asarray(img)
        mask = data.get("mask")
        mask = np.asarray(mask) if mask is not None else None
        arr, mask = self._fit_to_crop(arr, mask, ch, cw)
        h, w = arr.shape[:2]

        def sample_ij():
            return random.randint(0, h - ch), random.randint(0, w - cw)

        i, j = sample_ij()
        # resample crops dominated by one segmentation class (reference
        # get_params_from_mask, 10 tries)
        max_ratio = getattr(
            self.opts, "image_augmentation.random_crop.seg_class_max_ratio",
            None)
        if max_ratio is not None and mask is not None:
            for _ in range(10):
                m = mask[i: i + ch, j: j + cw]
                labels, counts = np.unique(m, return_counts=True)
                valid = counts[labels != self.ignore_idx]
                if valid.size > 0:
                    ratio = valid.max() / valid.sum()
                    if len(counts) > 1 and ratio < max_ratio:
                        break
                i, j = sample_ij()
        data["image"] = Image.fromarray(arr[i: i + ch, j: j + cw])
        if mask is not None:
            data["mask"] = mask[i: i + ch, j: j + cw]
        return data


@TRANSFORMATIONS_REGISTRY.register(name="ssd_cropping", type="image_pil")
class SSDCroping(BaseTransformation):
    """SSD-paper IoU-constrained random crop (reference image_pil.py:1016):
    pick a min-IoU option, sample a crop whose IoU with every kept box meets
    it, keep boxes whose centers fall inside, translate/clip box coords."""

    def __init__(self, opts, trials: int = None, **kwargs) -> None:
        super().__init__(opts)
        self.trials = trials or getattr(
            opts, "image_augmentation.ssd_crop.n_trials", 40) or 40
        # reference iou-thresholds (image_pil.py:1051): 1.0 = keep original
        ious = getattr(opts, "image_augmentation.ssd_crop.iou_thresholds",
                       None) or [0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 1.0]
        self.iou_options = tuple(None if v >= 1.0 else float(v) for v in ious)
        self.min_aspect = getattr(
            opts, "image_augmentation.ssd_crop.min_aspect_ratio", 0.5) or 0.5
        self.max_aspect = getattr(
            opts, "image_augmentation.ssd_crop.max_aspect_ratio", 2.0) or 2.0

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.ssd-crop.enable",
                           action="store_true", default=False)
        # reference flags (image_pil.py:1045-1070)
        group.add_argument("--image-augmentation.ssd-crop.iou-thresholds",
                           type=float, nargs="+",
                           default=[0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 1.0])
        group.add_argument("--image-augmentation.ssd-crop.n-trials", type=int,
                           default=40)
        group.add_argument("--image-augmentation.ssd-crop.min-aspect-ratio",
                           type=float, default=0.5)
        group.add_argument("--image-augmentation.ssd-crop.max-aspect-ratio",
                           type=float, default=2.0)
        return parser

    @staticmethod
    def _iou(rect: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        lt = np.maximum(rect[:2], boxes[:, :2])
        rb = np.minimum(rect[2:], boxes[:, 2:])
        inter = np.prod(np.clip(rb - lt, 0, None), axis=1)
        a_rect = (rect[2] - rect[0]) * (rect[3] - rect[1])
        a_box = np.prod(np.clip(boxes[:, 2:] - boxes[:, :2], 0, None), axis=1)
        return inter / np.maximum(a_rect + a_box - inter, 1e-8)

    def __call__(self, data: Dict) -> Dict:
        boxes = np.asarray(data.get("box_coordinates", np.zeros((0, 4))),
                           np.float32)
        if boxes.shape[0] == 0:
            return data
        img = _to_pil(data["image"])
        labels = np.asarray(data.get("box_labels", np.zeros(len(boxes))),
                            np.int64)
        w, h = img.width, img.height
        while True:
            min_iou = random.choice(self.iou_options)
            if min_iou is None:
                return data
            for _ in range(self.trials):
                cw = random.uniform(0.3, 1.0) * w
                ch = random.uniform(0.3, 1.0) * h
                if not self.min_aspect < cw / ch < self.max_aspect:
                    continue
                left = random.uniform(0, w - cw)
                top = random.uniform(0, h - ch)
                # integral rect so PIL's crop and the box translation agree
                rect = np.array([int(left), int(top),
                                 int(left + cw), int(top + ch)], np.float32)
                if self._iou(rect, boxes).min() < min_iou:
                    continue
                centers = (boxes[:, :2] + boxes[:, 2:]) / 2
                keep = ((centers[:, 0] > rect[0]) & (centers[:, 0] < rect[2])
                        & (centers[:, 1] > rect[1]) & (centers[:, 1] < rect[3]))
                if not keep.any():
                    continue
                kept = boxes[keep].copy()
                kept[:, :2] = np.maximum(kept[:, :2], rect[:2]) - rect[:2]
                kept[:, 2:] = np.minimum(kept[:, 2:], rect[2:]) - rect[:2]
                data["image"] = img.crop(tuple(int(v) for v in rect))
                data["box_coordinates"] = kept
                data["box_labels"] = labels[keep]
                if "mask" in data and data["mask"] is not None:
                    m = np.asarray(data["mask"])
                    data["mask"] = m[int(rect[1]): int(rect[3]),
                                     int(rect[0]): int(rect[2])]
                return data


@TRANSFORMATIONS_REGISTRY.register(name="photo_metric_distort", type="image_pil")
class PhotometricDistort(BaseTransformation):
    """Photometric distortion for detection (reference image_pil.py:1194-1352):
    ColorJitter-style MULTIPLICATIVE brightness (beta), contrast (alpha),
    saturation (gamma), hue shift (delta, fraction of the color wheel), each
    applied with prob p; contrast randomly before or after color ops; random
    channel permutation with prob p."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        g = lambda k, d: getattr(  # noqa: E731
            opts, f"image_augmentation.photo_metric_distort.{k}", d) or d
        self.p = getattr(opts, "image_augmentation.photo_metric_distort.p", 0.5)
        self.contrast = (g("alpha_min", 0.5), g("alpha_max", 1.5))
        self.brightness = (g("beta_min", 0.875), g("beta_max", 1.125))
        self.saturation = (g("gamma_min", 0.5), g("gamma_max", 1.5))
        self.hue = (g("delta_min", -0.05), g("delta_max", 0.05))

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--image-augmentation.photo-metric-distort.enable",
                           action="store_true", default=False)
        group.add_argument("--image-augmentation.photo-metric-distort.p",
                           type=float, default=0.5)
        # reference ranges (image_pil.py:1204-1238)
        for name, default in (("alpha-min", 0.5), ("alpha-max", 1.5),
                              ("beta-min", 0.875), ("beta-max", 1.125),
                              ("gamma-min", 0.5), ("gamma-max", 1.5),
                              ("delta-min", -0.05), ("delta-max", 0.05)):
            group.add_argument(
                f"--image-augmentation.photo-metric-distort.{name}",
                type=float, default=default)
        return parser

    def __call__(self, data: Dict) -> Dict:
        from PIL import ImageEnhance

        img = _to_pil(data["image"])
        r = np.random.rand(7)
        if r[0] < self.p:  # brightness (multiplicative)
            img = ImageEnhance.Brightness(img).enhance(
                random.uniform(*self.brightness))
        contrast_before = r[1] < self.p
        if contrast_before and r[2] < self.p:
            img = ImageEnhance.Contrast(img).enhance(
                random.uniform(*self.contrast))
        if r[3] < self.p:  # saturation
            img = ImageEnhance.Color(img).enhance(
                random.uniform(*self.saturation))
        if r[4] < self.p:  # hue: shift H by a fraction of the color wheel
            shift = random.uniform(*self.hue)
            hsv = np.asarray(img.convert("HSV"), np.uint8).copy()
            hsv[..., 0] = (hsv[..., 0].astype(np.int32)
                           + int(round(shift * 255.0))) % 256
            img = Image.fromarray(hsv, "HSV").convert("RGB")
        if not contrast_before and r[5] < self.p:
            img = ImageEnhance.Contrast(img).enhance(
                random.uniform(*self.contrast))
        if r[6] < self.p and img.mode != "L":
            arr = np.asarray(img)
            img = Image.fromarray(
                arr[..., np.random.permutation(arr.shape[-1])])
        data["image"] = img
        return data


@TRANSFORMATIONS_REGISTRY.register(name="to_tensor", type="image_pil")
class ToFloatTensor(BaseTransformation):
    """PIL/uint8 -> float32 HWC in [0,1] numpy (device transfer happens later;
    mixup is a device-tier op). Optional channel mean/std normalization
    (reference image_pil.py to_tensor mean-std-normalization flags; CVNets
    recipes train on [0,1] so it is off by default)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.normalize = getattr(
            opts,
            "image_augmentation.to_tensor.mean_std_normalization.enable", False)
        if self.normalize:
            mean = getattr(
                opts, "image_augmentation.to_tensor.mean_std_normalization.mean",
                None) or [0.485, 0.456, 0.406]
            std = getattr(
                opts, "image_augmentation.to_tensor.mean_std_normalization.std",
                None) or [0.229, 0.224, 0.225]
            self.mean = np.asarray(mean, np.float32)
            self.std = np.asarray(std, np.float32)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument(
            "--image-augmentation.to-tensor.mean-std-normalization.enable",
            action="store_true", default=False)
        group.add_argument(
            "--image-augmentation.to-tensor.mean-std-normalization.mean",
            type=float, nargs="+", default=None)
        group.add_argument(
            "--image-augmentation.to-tensor.mean-std-normalization.std",
            type=float, nargs="+", default=None)
        group.add_argument("--image-augmentation.to-tensor.dtype", type=str,
                           default="float",
                           help="float (default), half/float16, or uint8 "
                                "(raw pixels; reference image_pil.py:1962)")
        return parser

    def __call__(self, data: Dict) -> Dict:
        dtype = (getattr(self.opts, "image_augmentation.to_tensor.dtype",
                         "float") or "float").lower()
        arr = np.asarray(data["image"])
        if arr.ndim == 2:
            arr = arr[:, :, None].repeat(3, axis=2)
        if dtype == "uint8":
            # reference image_pil.py:1962-1968: uint8 keeps raw [0, 255]
            # pixels (normalization then happens on device)
            if arr.dtype != np.uint8:
                arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
            data["image"] = arr
        else:
            if arr.dtype == np.uint8:
                arr = arr.astype(np.float32) / 255.0
            arr = arr.astype(np.float32)
            if self.normalize:
                arr = (arr - self.mean) / self.std
            if dtype in ("half", "float16"):
                arr = arr.astype(np.float16)
            data["image"] = arr
        if "mask" in data and data["mask"] is not None:
            data["mask"] = np.asarray(data["mask"]).astype(np.int32)
        return data
