"""Box matcher registry (parity: reference cvnets/matcher_det/__init__.py)."""

from __future__ import annotations

import argparse

from cvnets_tpu.utils.registry import Registry

MATCHER_REGISTRY = Registry(
    registry_name="matcher",
    lazy_load_dirs=["models/matcher_det"],
)


def arguments_box_matcher(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Box matcher")
    group.add_argument("--matcher.name", type=str, default=None)
    return MATCHER_REGISTRY.all_arguments(parser)


def build_matcher(opts, *args, **kwargs):
    matcher_name = getattr(opts, "matcher.name")
    return MATCHER_REGISTRY[matcher_name](opts, *args, **kwargs)
