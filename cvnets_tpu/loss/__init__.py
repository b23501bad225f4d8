"""Loss registry (parity: reference loss_fn/__init__.py:14-58)."""

from __future__ import annotations

import argparse

from cvnets_tpu.loss.base_criteria import BaseCriteria
from cvnets_tpu.utils.registry import Registry

LOSS_REGISTRY = Registry(
    registry_name="loss",
    base_class=BaseCriteria,
    lazy_load_dirs=["loss"],
)


def add_loss_fn_arguments(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Loss function arguments")
    group.add_argument(
        "--loss.category", type=str, default="classification",
        help="Loss function category (classification, segmentation, detection, ...)",
    )
    parser = BaseCriteria.add_arguments(parser)
    return LOSS_REGISTRY.all_arguments(parser)


def build_loss_fn(opts, category: str = "", *args, **kwargs) -> BaseCriteria:
    """Build the loss selected by ``loss.category`` / ``loss.<category>.name``
    (parity: reference loss_fn/__init__.py:22)."""
    if not category:
        category = getattr(opts, "loss.category")
    if category == "composite_loss":
        # the composite config is the list itself (loss.composite_loss)
        return LOSS_REGISTRY["composite_loss", "composite_loss"](opts, *args,
                                                                **kwargs)
    loss_fn_name = getattr(opts, f"loss.{category}.name", None)
    if loss_fn_name is None:
        from cvnets_tpu.utils import logger

        logger.error(f"loss.{category}.name is not set")
    return LOSS_REGISTRY[loss_fn_name, category](opts, *args, **kwargs)
