"""Video readers (parity: reference data/video_reader/base_av_reader.py:30 +
pyav_reader.py + decord_reader.py).

The environment has no PyAV/decord/ffmpeg; the primary reader decodes
folder-of-frames clips with PIL (a standard Kinetics preprocessing layout). The
pyav/decord readers keep their registry names and raise a clear error if their
backing library is absent, preserving the reference's config surface.
"""

from __future__ import annotations

import argparse
import os
import random
from typing import Dict, List, Optional

import numpy as np

from cvnets_tpu.data.video_reader import VIDEO_READER_REGISTRY
from cvnets_tpu.utils import logger


class BaseAVReader:
    """Clip sampling contract (reference base_av_reader.py): ``read_video`` returns
    {"video": (n_clips, T, H, W, C) float32 in [0,1], "audio": optional}."""

    def __init__(self, opts, is_training: bool = False, *args, **kwargs) -> None:
        self.opts = opts
        self.is_training = is_training
        self.frames_per_clip = getattr(opts, "video_reader.frames_per_clip", 8)
        self.clips_per_video = getattr(opts, "video_reader.clips_per_video", 1)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BaseAVReader:
            return parser
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--video-reader.frames-per-clip", type=int, default=8)
        group.add_argument("--video-reader.clips-per-video", type=int, default=1)
        return parser

    def _sample_frame_ids(self, total: int) -> List[List[int]]:
        """random clips when training, uniform spread at eval
        (reference clip sampling)."""
        T = self.frames_per_clip
        clips = []
        for ci in range(self.clips_per_video):
            if total <= T:
                ids = list(range(total)) + [total - 1] * (T - total)
            elif self.is_training:
                start = random.randint(0, total - T)
                ids = list(range(start, start + T))
            else:
                start = int(ci * (total - T) / max(1, self.clips_per_video - 1)) \
                    if self.clips_per_video > 1 else (total - T) // 2
                ids = list(range(start, start + T))
            clips.append(ids)
        return clips

    def read_video(self, path: str) -> Optional[Dict]:
        raise NotImplementedError


@VIDEO_READER_REGISTRY.register(name="frame_folder")
class FrameFolderReader(BaseAVReader):
    """Reads a directory of ordered frame images as a video."""

    def read_video(self, path: str) -> Optional[Dict]:
        from PIL import Image

        if not os.path.isdir(path):
            return None
        frames = sorted(
            f for f in os.listdir(path)
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        )
        if not frames:
            return None
        clips = []
        for ids in self._sample_frame_ids(len(frames)):
            imgs = []
            for i in ids:
                img = Image.open(os.path.join(path, frames[i])).convert("RGB")
                imgs.append(np.asarray(img, np.float32) / 255.0)
            clips.append(np.stack(imgs))
        return {"video": np.stack(clips), "audio": None}


@VIDEO_READER_REGISTRY.register(name="pyav")
class PyAVReader(BaseAVReader):
    def __init__(self, opts, *args, **kwargs) -> None:
        super().__init__(opts, *args, **kwargs)
        try:
            import av  # noqa: F401
        except ImportError:
            logger.error(
                "PyAV is not available in this environment; use the"
                " 'frame_folder' video reader (pre-extract frames)."
            )

    def read_video(self, path: str) -> Optional[Dict]:
        import av

        container = av.open(path)
        frames = [
            np.asarray(f.to_image(), np.float32) / 255.0
            for f in container.decode(video=0)
        ]
        container.close()
        if not frames:
            return None
        clips = [np.stack([frames[i] for i in ids])
                 for ids in self._sample_frame_ids(len(frames))]
        return {"video": np.stack(clips), "audio": None}


@VIDEO_READER_REGISTRY.register(name="decord")
class DecordReader(BaseAVReader):
    def __init__(self, opts, *args, **kwargs) -> None:
        super().__init__(opts, *args, **kwargs)
        try:
            import decord  # noqa: F401
        except ImportError:
            logger.error(
                "decord is not available in this environment; use the"
                " 'frame_folder' video reader (pre-extract frames)."
            )
