"""Segmentation losses (parity: reference loss_fn/segmentation/cross_entropy.py:19-190)."""

from __future__ import annotations

import argparse
from typing import Any

import jax.numpy as jnp
import optax

from cvnets_tpu.loss import LOSS_REGISTRY
from cvnets_tpu.loss.base_criteria import BaseCriteria


class BaseSegmentationCriteria(BaseCriteria):
    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BaseSegmentationCriteria:
            return parser
        group = parser.add_argument_group(title="Segmentation loss arguments")
        group.add_argument("--loss.segmentation.name", type=str,
                           default="cross_entropy")
        return parser


LOSS_REGISTRY.register(name="__base__", type="segmentation")(BaseSegmentationCriteria)


@LOSS_REGISTRY.register(name="cross_entropy", type="segmentation")
class SegCrossEntropy(BaseSegmentationCriteria):
    """Pixel CE with ignore index, label smoothing, optional class weighting and
    aux-head weighting (reference segmentation/cross_entropy.py:19-190)."""

    def __init__(self, opts, *args, **kwargs) -> None:
        super().__init__(opts)
        self.ignore_idx = getattr(
            opts, "loss.segmentation.cross_entropy.ignore_index", 255)
        self.label_smoothing = getattr(
            opts, "loss.segmentation.cross_entropy.label_smoothing", 0.0) or 0.0
        self.aux_wt = getattr(opts, "loss.segmentation.cross_entropy.aux_weight", 0.4)
        self.use_class_wts = getattr(
            opts, "loss.segmentation.cross_entropy.class_weights", False)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--loss.segmentation.cross-entropy.class-weights",
                           action="store_true")
        group.add_argument("--loss.segmentation.cross-entropy.aux-weight",
                           type=float, default=0.4)
        group.add_argument("--loss.segmentation.cross-entropy.ignore-index",
                           type=int, default=255)
        group.add_argument("--loss.segmentation.cross-entropy.label-smoothing",
                           type=float, default=0.0)
        return parser

    def _ce(self, logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        n_classes = logits.shape[-1]
        if logits.ndim == 4 and target.ndim == 3 \
                and tuple(logits.shape[1:3]) != tuple(target.shape[1:3]):
            # Head-resolution logits (the model skipped its train-time
            # upsample): fuse bilinear-resize + CE so the full-resolution
            # logits tensor never materializes. Semantically identical to
            # upsampling first (tests/test_losses.py fused-parity tests);
            # on a v5e chip this is the difference between 81.7 and 196.8
            # img/s for DeepLabv3@512 (docs/perf/PROFILE-tasks.md).
            from cvnets_tpu.ops.seg_ce import fused_resize_ce

            wts = None
            if self.use_class_wts:
                safe_full = jnp.where(target == self.ignore_idx, 0, target)
                wts = self._class_weights(safe_full, n_classes)
            return fused_resize_ce(
                logits, target, ignore_idx=self.ignore_idx,
                label_smoothing=float(self.label_smoothing), class_wts=wts)
        valid = target != self.ignore_idx
        safe_target = jnp.where(valid, target, 0)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), safe_target
        )
        if self.label_smoothing > 0:
            smooth = optax.softmax_cross_entropy(
                logits.astype(jnp.float32),
                jnp.full_like(logits, 1.0 / n_classes, dtype=jnp.float32),
            )
            losses = (1 - self.label_smoothing) * losses + self.label_smoothing * smooth
        if self.use_class_wts:
            wts = self._class_weights(safe_target, n_classes)
            losses = losses * jnp.take(wts, safe_target)
        losses = losses * valid
        return jnp.sum(losses) / jnp.maximum(jnp.sum(valid), 1.0)

    def __call__(self, input_sample: Any, prediction: Any, target: Any, **kwargs):
        if isinstance(prediction, dict) and "segmentation_output" in prediction:
            main = self._ce(prediction["segmentation_output"], target)
            if "aux_output" in prediction:
                aux = self._ce(prediction["aux_output"], target)
                total = main + self.aux_wt * aux
                return {"total_loss": total, "seg_loss": main, "aux_loss": aux}
            return main
        return self._ce(prediction, target)
