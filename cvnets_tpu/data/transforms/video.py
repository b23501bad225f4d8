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


@TRANSFORMATIONS_REGISTRY.register(name="video_random_resized_crop", type="video")
class VideoRandomResizedCrop(BaseTransformation):
    """Shared random scale/aspect crop + resize across the clip (reference
    data/transforms/video.py:377)."""

    def __init__(self, opts, size=None, **kwargs) -> None:
        super().__init__(opts)
        self.size = size
        self.scale = tuple(getattr(
            opts, "video_augmentation.random_resized_crop.scale",
            (0.08, 1.0)) or (0.08, 1.0))
        ratio = getattr(opts,
                        "video_augmentation.random_resized_crop.aspect_ratio",
                        (3.0 / 4.0, 4.0 / 3.0)) or (3.0 / 4.0, 4.0 / 3.0)
        self.ratio = tuple(ratio)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--video-augmentation.random-resized-crop.enable",
                           action="store_true", default=False)
        group.add_argument("--video-augmentation.random-resized-crop.scale",
                           type=float, nargs="+", default=(0.08, 1.0))
        group.add_argument(
            "--video-augmentation.random-resized-crop.aspect-ratio",
            type=float, nargs="+", default=(3.0 / 4.0, 4.0 / 3.0))
        return parser

    def __call__(self, data: Dict) -> Dict:
        import math

        from PIL import Image

        v = np.asarray(data["video"])
        t, h, w, c = v.shape
        size = self.size or data.get("crop_size") or (h, w)
        th, tw = size if isinstance(size, (tuple, list)) else (size, size)
        area = h * w
        log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        ch = cw = None
        for _ in range(10):
            target_area = area * random.uniform(*self.scale)
            aspect = math.exp(random.uniform(*log_ratio))
            cw_c = int(round(math.sqrt(target_area * aspect)))
            ch_c = int(round(math.sqrt(target_area / aspect)))
            if 0 < cw_c <= w and 0 < ch_c <= h:
                ch, cw = ch_c, cw_c
                break
        if ch is None:
            ch, cw = min(h, w), min(h, w)
        i = random.randint(0, h - ch)
        j = random.randint(0, w - cw)
        frames = []
        for frame in v[:, i: i + ch, j: j + cw]:
            pil = Image.fromarray((np.clip(frame, 0, 1) * 255).astype(np.uint8))
            frames.append(
                np.asarray(pil.resize((tw, th), Image.BILINEAR), np.float32) / 255.0)
        data["video"] = np.stack(frames)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="video_random_short_side_resize_crop",
                                   type="video")
class VideoRandomShortSideResizeCrop(BaseTransformation):
    """Resize the short side into [min, max] then random-crop (reference :504)."""

    def __init__(self, opts, size=None, **kwargs) -> None:
        super().__init__(opts)
        self.size = size
        self.short_min = getattr(
            opts, "video_augmentation.random_short_side_resize_crop.short_side_min",
            256)
        self.short_max = getattr(
            opts, "video_augmentation.random_short_side_resize_crop.short_side_max",
            320)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument(
            "--video-augmentation.random-short-side-resize-crop.enable",
            action="store_true", default=False)
        group.add_argument(
            "--video-augmentation.random-short-side-resize-crop.short-side-min",
            type=int, default=256)
        group.add_argument(
            "--video-augmentation.random-short-side-resize-crop.short-side-max",
            type=int, default=320)
        return parser

    def __call__(self, data: Dict) -> Dict:
        from PIL import Image

        v = np.asarray(data["video"])
        t, h, w, c = v.shape
        short = random.randint(self.short_min, self.short_max)
        scale = short / min(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        frames = []
        for frame in v:
            pil = Image.fromarray((np.clip(frame, 0, 1) * 255).astype(np.uint8))
            frames.append(
                np.asarray(pil.resize((nw, nh), Image.BILINEAR), np.float32) / 255.0)
        data["video"] = np.stack(frames)
        return VideoRandomCrop(self.opts, size=self.size)(data)


@TRANSFORMATIONS_REGISTRY.register(name="video_center_crop", type="video")
class VideoCenterCrop(BaseTransformation):
    """Center crop shared across frames (reference :710)."""

    def __init__(self, opts, size=None, **kwargs) -> None:
        super().__init__(opts)
        self.size = size

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--video-augmentation.center-crop.enable",
                           action="store_true", default=False)
        return parser

    def __call__(self, data: Dict) -> Dict:
        v = np.asarray(data["video"])
        t, h, w, c = v.shape
        size = self.size or data.get("crop_size") or (h, w)
        ch, cw = size if isinstance(size, (tuple, list)) else (size, size)
        ch, cw = min(ch, h), min(cw, w)
        i = (h - ch) // 2
        j = (w - cw) // 2
        data["video"] = v[:, i: i + ch, j: j + cw]
        return data


@TRANSFORMATIONS_REGISTRY.register(name="video_to_tensor", type="video")
class VideoToTensor(BaseTransformation):
    """(T, H, W, C) float32 in [0, 1] (reference to_tensor :159; layout already
    channels-last for TPU)."""

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--video-augmentation.to-tensor.enable",
                           action="store_true", default=True)
        return parser

    def __call__(self, data: Dict) -> Dict:
        v = np.asarray(data["video"])
        if v.dtype == np.uint8:
            v = v.astype(np.float32) / 255.0
        data["video"] = np.clip(v.astype(np.float32), 0.0, 1.0)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="video_crop_by_bounding_box", type="video")
class VideoCropByBoundingBox(BaseTransformation):
    """Crop every frame to its (interpolated) per-frame box, then resize
    (reference crop_by_bounding_box :829 — used by tracking-style datasets).
    Expects data["box_coordinates"] of shape (T, 4) xyxy absolute."""

    def __init__(self, opts, size=None, **kwargs) -> None:
        super().__init__(opts)
        self.size = size
        self.multiplier = getattr(
            opts, "video_augmentation.crop_by_bounding_box.multiplier", 1.0)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--video-augmentation.crop-by-bounding-box.enable",
                           action="store_true", default=False)
        group.add_argument("--video-augmentation.crop-by-bounding-box.multiplier",
                           type=float, default=1.0)
        return parser

    def __call__(self, data: Dict) -> Dict:
        from PIL import Image

        v = np.asarray(data["video"])
        boxes = np.asarray(data["box_coordinates"], np.float32)
        t, h, w, c = v.shape
        size = self.size or data.get("crop_size") or (h, w)
        th, tw = size if isinstance(size, (tuple, list)) else (size, size)
        out = []
        for frame, box in zip(v, boxes):
            x1, y1, x2, y2 = box
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            bw = (x2 - x1) * self.multiplier / 2
            bh = (y2 - y1) * self.multiplier / 2
            x1, x2 = int(max(cx - bw, 0)), int(min(cx + bw, w))
            y1, y2 = int(max(cy - bh, 0)), int(min(cy + bh, h))
            crop = frame[y1:max(y2, y1 + 1), x1:max(x2, x1 + 1)]
            pil = Image.fromarray((np.clip(crop, 0, 1) * 255).astype(np.uint8))
            out.append(
                np.asarray(pil.resize((tw, th), Image.BILINEAR), np.float32) / 255.0)
        data["video"] = np.stack(out)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="video_shuffle_audios", type="video")
class VideoShuffleAudios(BaseTransformation):
    """Shuffle audio tracks across a batch of clips, labeling which stayed in
    sync (reference shuffle-audios :991 — A/V-sync pretext task)."""

    def __init__(self, opts, **kwargs) -> None:
        super().__init__(opts)
        self.shuffle_ratio = getattr(
            opts, "video_augmentation.shuffle_audios.shuffle_ratio", 0.5)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--video-augmentation.shuffle-audios.enable",
                           action="store_true", default=False)
        group.add_argument("--video-augmentation.shuffle-audios.shuffle-ratio",
                           type=float, default=0.5)
        return parser

    def __call__(self, data: Dict) -> Dict:
        audio = data.get("audio")
        if audio is None:
            return data
        audio = np.asarray(audio)
        n = audio.shape[0]
        if n < 2:
            data["is_shuffled"] = np.zeros((n,), np.int64)
            return data
        n_shuffle = int(round(n * self.shuffle_ratio))
        idx = np.arange(n)
        if n_shuffle >= 2:
            sel = np.random.choice(n, size=n_shuffle, replace=False)
            perm = np.random.permutation(sel)
            # ensure a derangement on the selected subset
            while np.any(perm == sel):
                perm = np.random.permutation(sel)
            idx[sel] = perm
        data["audio"] = audio[idx]
        data["is_shuffled"] = (idx != np.arange(n)).astype(np.int64)
        return data


@TRANSFORMATIONS_REGISTRY.register(name="save-inputs", type="video")
class SaveInputs(BaseTransformation):
    """Dump the clips a dataset __getitem__ produced, for eyeballing the
    preprocessing (reference video.py:187-258). The reference muxes an
    annotated video via pyav; this environment has no video encoder, so each
    clip is written as per-frame PNGs plus an optional captions sidecar —
    the same debugging affordance without the codec dependency."""

    def __init__(self, opts, get_frame_captions=None, **kwargs) -> None:
        super().__init__(opts)
        self.enable = getattr(
            opts, "video_augmentation.save_inputs.enable", False)
        self.save_dir = getattr(
            opts, "video_augmentation.save_inputs.save_dir", None)
        self.get_frame_captions = get_frame_captions
        if self.enable and not self.save_dir:
            from cvnets_tpu.utils import logger

            logger.error(
                "Please provide a value for --video-augmentation.save-inputs.save-dir")
        self._counter = 0

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--video-augmentation.save-inputs.enable",
                           action="store_true", default=False)
        group.add_argument("--video-augmentation.save-inputs.save-dir",
                           type=str, default=None)
        return parser

    def __call__(self, data: Dict) -> Dict:
        if not self.enable:
            return data
        import os

        from PIL import Image

        video = np.asarray(data.get("video") if "video" in data
                           else data["samples"]["video"])
        # accept [T,H,W,C] or [N,T,H,W,C]
        clips = video[None] if video.ndim == 4 else video
        out_dir = os.path.join(self.save_dir, f"sample_{self._counter:06d}")
        os.makedirs(out_dir, exist_ok=True)
        for ci, clip in enumerate(clips):
            for fi, frame in enumerate(clip):
                arr = np.clip(frame, 0, 1) if frame.dtype.kind == "f" else frame / 255.0
                Image.fromarray((arr * 255).astype(np.uint8)).save(
                    os.path.join(out_dir, f"clip{ci:02d}_frame{fi:04d}.png"))
        if self.get_frame_captions is not None:
            with open(os.path.join(out_dir, "captions.txt"), "w") as f:
                f.write("\n".join(self.get_frame_captions(data)))
        self._counter += 1
        return data


# ---- reference registry-name aliases (reference data/transforms/video.py
# registers the spatial ops under the same names as the image tier with
# type="video"; keep both spellings valid for config/programmatic parity)
TRANSFORMATIONS_REGISTRY.register(name="resize", type="video")(VideoResize)
TRANSFORMATIONS_REGISTRY.register(name="random_crop", type="video")(VideoRandomCrop)
TRANSFORMATIONS_REGISTRY.register(name="random_horizontal_flip", type="video")(
    VideoRandomHorizontalFlip)
TRANSFORMATIONS_REGISTRY.register(name="random_resized_crop", type="video")(
    VideoRandomResizedCrop)
TRANSFORMATIONS_REGISTRY.register(name="random_short_side_resize_crop",
                                  type="video")(VideoRandomShortSideResizeCrop)
TRANSFORMATIONS_REGISTRY.register(name="center_crop", type="video")(VideoCenterCrop)
TRANSFORMATIONS_REGISTRY.register(name="to_tensor", type="video")(VideoToTensor)
TRANSFORMATIONS_REGISTRY.register(name="crop_by_bounding_box", type="video")(
    VideoCropByBoundingBox)
TRANSFORMATIONS_REGISTRY.register(name="shuffle-audios", type="video")(
    VideoShuffleAudios)
