"""Collate-fn registry (parity: reference data/collate_fns/__init__.py:11-43)."""

from __future__ import annotations

import argparse

from cvnets_tpu.utils.registry import Registry

COLLATE_FN_REGISTRY = Registry(
    registry_name="collate_fn",
    lazy_load_dirs=["data/collate"],
)


def arguments_collate_fn(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    return COLLATE_FN_REGISTRY.all_arguments(parser)


def build_collate_fn(opts, mode: str = "train"):
    attr = f"dataset.collate_fn_name_{mode}"
    name = getattr(opts, attr, None) or "default_collate_fn"
    return COLLATE_FN_REGISTRY[name]
