"""Tokenizer registry (parity: reference data/text_tokenizer/__init__.py:12)."""

from __future__ import annotations

import argparse

from cvnets_tpu.utils.registry import Registry

TOKENIZER_REGISTRY = Registry(
    registry_name="tokenizer",
    lazy_load_dirs=["data/text_tokenizer"],
)


def arguments_tokenizer(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Tokenizer arguments")
    group.add_argument("--text-tokenizer.name", type=str, default=None)
    return TOKENIZER_REGISTRY.all_arguments(parser)


def build_tokenizer(opts, *args, **kwargs):
    tokenizer_name = getattr(opts, "text_tokenizer.name")
    return TOKENIZER_REGISTRY[tokenizer_name](opts, *args, **kwargs)
