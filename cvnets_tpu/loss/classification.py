"""Classification losses (parity: reference loss_fn/classification/*)."""

from __future__ import annotations

import argparse
from typing import Any

import jax
import jax.numpy as jnp
import optax

from cvnets_tpu.loss import LOSS_REGISTRY
from cvnets_tpu.loss.base_criteria import BaseCriteria


@LOSS_REGISTRY.register(name="__base__", type="classification")
class BaseClassificationCriteria(BaseCriteria):
    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BaseClassificationCriteria:
            return parser
        group = parser.add_argument_group(title="Classification loss arguments")
        group.add_argument("--loss.classification.name", type=str, default="cross_entropy")
        return parser


@LOSS_REGISTRY.register(name="cross_entropy", type="classification")
class CrossEntropy(BaseClassificationCriteria):
    """Softmax CE with label smoothing and optional inverse-frequency class weights
    (parity: reference loss_fn/classification/cross_entropy.py:19)."""

    def __init__(self, opts, *args, **kwargs) -> None:
        super().__init__(opts)
        self.label_smoothing = getattr(
            opts, "loss.classification.cross_entropy.label_smoothing", 0.0
        ) or 0.0
        self.use_class_wts = getattr(
            opts, "loss.classification.cross_entropy.class_weights", False
        )
        self.ignore_idx = getattr(opts, "loss.classification.cross_entropy.ignore_index", -1)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--loss.classification.cross-entropy.class-weights",
                           action="store_true")
        group.add_argument("--loss.classification.cross-entropy.label-smoothing",
                           type=float, default=0.0)
        group.add_argument("--loss.classification.cross-entropy.ignore-index",
                           type=int, default=-1)
        return parser

    def _compute(self, logits: jnp.ndarray, target: jnp.ndarray,
                 label_smoothing: float) -> jnp.ndarray:
        n_classes = logits.shape[-1]
        if target.ndim == logits.ndim:
            # soft targets (e.g. mixup): target is a prob distribution
            soft = target
            if label_smoothing > 0:
                soft = soft * (1 - label_smoothing) + label_smoothing / n_classes
            losses = optax.softmax_cross_entropy(logits, soft)
            return jnp.mean(losses)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.maximum(target, 0)
        )
        if label_smoothing > 0:
            smooth = optax.softmax_cross_entropy(
                logits, jnp.full_like(logits, 1.0 / n_classes)
            )
            losses = (1 - label_smoothing) * losses + label_smoothing * smooth
        valid = (target != self.ignore_idx).astype(losses.dtype)
        if self.use_class_wts:
            wts = self._class_weights(jnp.maximum(target, 0), n_classes)
            losses = losses * jnp.take(wts, jnp.maximum(target, 0))
        return jnp.sum(losses * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    def __call__(self, input_sample: Any, prediction: Any, target: Any, **kwargs):
        logits = prediction["logits"] if isinstance(prediction, dict) else prediction
        ls = self.label_smoothing if kwargs.get("training", True) else 0.0
        return self._compute(logits, target, ls)


@LOSS_REGISTRY.register(name="binary_cross_entropy", type="classification")
class BinaryCrossEntropy(BaseClassificationCriteria):
    """Sigmoid BCE over one-hot/multi-label targets (parity: reference
    loss_fn/classification/binary_cross_entropy.py incl. the reduction flag)."""

    @classmethod
    def add_arguments(cls, parser):
        if cls.__name__ != "BinaryCrossEntropy":
            return parser
        group = parser.add_argument_group(cls.__name__)
        group.add_argument(
            "--loss.classification.binary-cross-entropy.reduction", type=str,
            default="mean", choices=["sum", "mean", "none", "batch_mean"],
            help="'batch_mean' divides the elementwise sum by the batch size")
        return parser

    def __call__(self, input_sample: Any, prediction: Any, target: Any, **kwargs):
        logits = prediction["logits"] if isinstance(prediction, dict) else prediction
        if target.ndim != logits.ndim:
            target = jax.nn.one_hot(target, logits.shape[-1], dtype=logits.dtype)
        elementwise = optax.sigmoid_binary_cross_entropy(logits, target)
        reduction = getattr(
            self.opts, "loss.classification.binary_cross_entropy.reduction",
            "mean") or "mean"
        if reduction == "sum":
            return jnp.sum(elementwise)
        if reduction == "none":
            return elementwise
        if reduction == "batch_mean":
            return jnp.sum(elementwise) / logits.shape[0]
        # historical repo behavior: mean over samples, summed over classes —
        # torch BCE 'mean' averages over ALL elements; match torch exactly
        return jnp.mean(elementwise)
