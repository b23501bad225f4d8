"""Detection losses (parity: reference loss_fn/detection/*)."""

from __future__ import annotations

import argparse
from typing import Any

import jax
import jax.numpy as jnp
import optax

from cvnets_tpu.loss import LOSS_REGISTRY
from cvnets_tpu.loss.base_criteria import BaseCriteria


class BaseDetectionCriteria(BaseCriteria):
    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BaseDetectionCriteria:
            return parser
        group = parser.add_argument_group(title="Detection loss arguments")
        group.add_argument("--loss.detection.name", type=str, default="ssd_multibox_loss")
        return parser


LOSS_REGISTRY.register(name="__base__", type="detection")(BaseDetectionCriteria)


def smooth_l1(pred, target, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)


@LOSS_REGISTRY.register(name="ssd_multibox_loss", type="detection")
class SSDLoss(BaseDetectionCriteria):
    """Hard-negative-mined CE + smooth-L1 regression (parity: reference
    loss_fn/detection/ssd_multibox_loss.py:22-102).

    The reference's sort-based negative mining translates to a static-shape
    rank computation: negatives are kept if their loss rank is within
    ``neg_pos_ratio * num_pos`` for the image.
    """

    def __init__(self, opts, *args, **kwargs) -> None:
        super().__init__(opts)
        self.neg_pos_ratio = getattr(
            opts, "loss.detection.ssd_multibox_loss.neg_pos_ratio", 3)
        self.label_smoothing = getattr(
            opts, "loss.detection.ssd_multibox_loss.label_smoothing", 0.0) or 0.0

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--loss.detection.ssd-multibox-loss.neg-pos-ratio",
                           type=int, default=3)
        group.add_argument("--loss.detection.ssd-multibox-loss.label-smoothing",
                           type=float, default=0.0)
        return parser

    def __call__(self, input_sample: Any, prediction: Any, target: Any, **kwargs):
        scores = prediction["scores"].astype(jnp.float32)  # (B, P, C)
        pred_locations = prediction["boxes"].astype(jnp.float32)  # (B, P, 4)
        gt_labels = target["box_labels"]  # (B, P)
        gt_locations = target["box_coordinates"]  # (B, P, 4)

        # ---- hard negative mining (static shapes) -------------------------
        log_probs = jax.nn.log_softmax(scores, axis=-1)
        neg_loss = -log_probs[..., 0]  # background loss per anchor
        pos_mask = gt_labels > 0
        num_pos = jnp.sum(pos_mask, axis=1, keepdims=True)  # (B, 1)
        # rank negatives by loss (descending); positives excluded
        neg_loss_masked = jnp.where(pos_mask, -jnp.inf, neg_loss)
        order = jnp.argsort(-neg_loss_masked, axis=1)
        ranks = jnp.argsort(order, axis=1)
        neg_mask = (~pos_mask) & (ranks < self.neg_pos_ratio * num_pos)

        mask = pos_mask | neg_mask
        ce = optax.softmax_cross_entropy_with_integer_labels(
            scores, jnp.maximum(gt_labels, 0)
        )
        cls_loss = jnp.sum(ce * mask)

        reg = smooth_l1(pred_locations, gt_locations)
        reg_loss = jnp.sum(jnp.sum(reg, axis=-1) * pos_mask)

        denom = jnp.maximum(jnp.sum(num_pos), 1.0)
        return (cls_loss + reg_loss) / denom


@LOSS_REGISTRY.register(name="mask_rcnn_loss", type="detection")
class MaskRCNNLoss(BaseDetectionCriteria):
    """Sums the loss dict produced by the Mask R-CNN model's forward
    (parity: reference loss_fn/detection/mask_rcnn_loss.py:160)."""

    def __init__(self, opts, *args, **kwargs) -> None:
        super().__init__(opts)
        self.classifier_weight = getattr(
            opts, "loss.detection.mask_rcnn_loss.classifier_weight", 1.0)
        self.box_reg_weight = getattr(
            opts, "loss.detection.mask_rcnn_loss.box_reg_weight", 1.0)
        self.mask_weight = getattr(
            opts, "loss.detection.mask_rcnn_loss.mask_weight", 1.0)
        self.objectness_weight = getattr(
            opts, "loss.detection.mask_rcnn_loss.objectness_weight", 1.0)
        self.rpn_box_reg = getattr(
            opts, "loss.detection.mask_rcnn_loss.rpn_box_reg", 1.0)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--loss.detection.mask-rcnn-loss.classifier-weight",
                           type=float, default=1.0)
        group.add_argument("--loss.detection.mask-rcnn-loss.box-reg-weight",
                           type=float, default=1.0)
        group.add_argument("--loss.detection.mask-rcnn-loss.mask-weight",
                           type=float, default=1.0)
        group.add_argument("--loss.detection.mask-rcnn-loss.objectness-weight",
                           type=float, default=1.0)
        group.add_argument("--loss.detection.mask-rcnn-loss.rpn-box-reg",
                           type=float, default=1.0)
        return parser

    def __call__(self, input_sample: Any, prediction: Any, target: Any, **kwargs):
        if not isinstance(prediction, dict) or "losses" not in prediction:
            raise ValueError("MaskRCNNLoss expects a prediction dict with 'losses'")
        losses = prediction["losses"]
        weights = {
            "loss_classifier": self.classifier_weight,
            "loss_box_reg": self.box_reg_weight,
            "loss_mask": self.mask_weight,
            "loss_objectness": self.objectness_weight,
            "loss_rpn_box_reg": self.rpn_box_reg,
        }
        out = {k: v for k, v in losses.items()}
        out["total_loss"] = sum(
            weights.get(k, 1.0) * v for k, v in losses.items()
        )
        return out
