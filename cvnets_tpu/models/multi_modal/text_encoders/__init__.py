"""Text encoder registry (parity: reference cvnets/text_encoders/__init__.py:12)."""

from __future__ import annotations

import argparse

from cvnets_tpu.utils.registry import Registry

TEXT_ENCODER_REGISTRY = Registry(
    registry_name="text_encoder",
    lazy_load_dirs=["models/multi_modal/text_encoders"],
)


def arguments_text_encoder(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Text encoder")
    group.add_argument("--model.text.name", type=str, default=None)
    return TEXT_ENCODER_REGISTRY.all_arguments(parser)


def build_text_encoder(opts, projection_dim: int, *args, **kwargs):
    text_encoder_name = getattr(opts, "model.text.name")
    return TEXT_ENCODER_REGISTRY[text_encoder_name](
        opts=opts, projection_dim=projection_dim, *args, **kwargs
    )
