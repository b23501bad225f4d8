"""Weighted sum of sub-losses (parity: reference loss_fn/composite_loss.py:21-219).

Config: ``loss.composite_loss`` is a list of entries, each with ``loss_category``,
``loss_weight`` and a nested loss config (flattened onto a cloned opts namespace for
the sub-loss build, exactly like the reference :69-140).
"""

from __future__ import annotations

import argparse
import copy
from typing import Any, Dict

import jax.numpy as jnp

from cvnets_tpu.loss import LOSS_REGISTRY
from cvnets_tpu.loss.base_criteria import BaseCriteria
from cvnets_tpu.options.utils import flatten_yaml_as_dict
from cvnets_tpu.utils import logger


@LOSS_REGISTRY.register(name="composite_loss", type="composite_loss")
class CompositeLoss(BaseCriteria):
    def __init__(self, opts, *args, **kwargs) -> None:
        super().__init__(opts)
        entries = getattr(opts, "loss.composite_loss", None)
        if not isinstance(entries, list) or not entries:
            logger.error(
                "loss.composite_loss must be a non-empty list of loss entries"
            )
        self.loss_fns: Dict[str, BaseCriteria] = {}
        self.loss_weights: Dict[str, float] = {}
        for entry in entries:
            entry = dict(entry)
            if "loss_category" not in entry or "loss_weight" not in entry:
                logger.error(
                    "each composite loss entry needs loss_category and loss_weight"
                )
            category = entry.pop("loss_category")
            weight = float(entry.pop("loss_weight"))
            sub_opts = copy.copy(opts)
            for k, v in flatten_yaml_as_dict(entry).items():
                setattr(sub_opts, f"loss.{k}" if not k.startswith("loss.") else k, v)
            loss_name = getattr(sub_opts, f"loss.{category}.name", None)
            if loss_name is None:
                # single-loss categories (e.g. neural_augmentation) register the
                # category name itself as the loss name
                if f"{category}:{category}" in LOSS_REGISTRY:
                    loss_name = category
                else:
                    logger.error(
                        f"loss.{category}.name missing for composite entry")
            self.loss_fns[category] = LOSS_REGISTRY[loss_name, category](sub_opts)
            self.loss_weights[category] = weight

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument(
            "--loss.composite-loss", type=str, default=None,
            help="List of loss entries; set via yaml (loss.composite_loss)",
        )
        return parser

    def __call__(self, input_sample: Any, prediction: Any, target: Any, **kwargs):
        out: Dict[str, jnp.ndarray] = {}
        total = 0.0
        for category, fn in self.loss_fns.items():
            val = fn(input_sample, prediction, target, **kwargs)
            if isinstance(val, dict):
                val = val["total_loss"]
            out[category] = val
            total = total + self.loss_weights[category] * val
        out["total_loss"] = total
        return out
