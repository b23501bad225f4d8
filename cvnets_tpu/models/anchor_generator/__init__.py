"""Anchor generator registry (parity: reference cvnets/anchor_generator/__init__.py)."""

from __future__ import annotations

import argparse

from cvnets_tpu.utils.registry import Registry

ANCHOR_GEN_REGISTRY = Registry(
    registry_name="anchor_gen",
    lazy_load_dirs=["models/anchor_generator"],
)


def arguments_anchor_gen(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Anchor generator")
    group.add_argument("--anchor-generator.name", type=str, default=None)
    return ANCHOR_GEN_REGISTRY.all_arguments(parser)


def build_anchor_generator(opts, *args, **kwargs):
    gen_name = getattr(opts, "anchor_generator.name")
    return ANCHOR_GEN_REGISTRY[gen_name](opts, *args, **kwargs)
