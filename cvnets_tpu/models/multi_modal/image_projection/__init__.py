"""Image projection head registry (parity: reference
cvnets/image_projection_layers/__init__.py:13)."""

from __future__ import annotations

import argparse

from cvnets_tpu.utils.registry import Registry

IMAGE_PROJECTION_HEAD_REGISTRY = Registry(
    registry_name="image_projection_head",
    lazy_load_dirs=["models/multi_modal/image_projection"],
)


def arguments_image_projection_head(
    parser: argparse.ArgumentParser,
) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Image projection head")
    group.add_argument("--model.image-projection-head.name", type=str, default=None)
    return IMAGE_PROJECTION_HEAD_REGISTRY.all_arguments(parser)


def build_image_projection_head(opts, in_dim: int, out_dim: int, *args, **kwargs):
    head_name = getattr(opts, "model.image_projection_head.name")
    return IMAGE_PROJECTION_HEAD_REGISTRY[head_name](
        opts=opts, in_dim=in_dim, out_dim=out_dim, *args, **kwargs
    )
