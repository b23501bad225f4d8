"""Video reader registry (parity: reference data/video_reader/__init__.py:13)."""

from __future__ import annotations

import argparse

from cvnets_tpu.utils.registry import Registry

VIDEO_READER_REGISTRY = Registry(
    registry_name="video_reader",
    lazy_load_dirs=["data/video_reader"],
)


def arguments_video_reader(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Video reader arguments")
    group.add_argument("--video-reader.name", type=str, default="frame_folder")
    # per-reader flags (incl. the shared BaseAVReader set: frames-per-clip,
    # fast-video-decoding, frame-stack-format, ...) come from the registry
    return VIDEO_READER_REGISTRY.all_arguments(parser)


def get_video_reader(opts, *args, **kwargs):
    name = getattr(opts, "video_reader.name", "frame_folder") or "frame_folder"
    return VIDEO_READER_REGISTRY[name](opts, *args, **kwargs)
