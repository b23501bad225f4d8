"""Mask R-CNN building blocks (parity: reference
cvnets/models/detection/utils/rcnn_utils.py:262 — RPNHead, FastRCNNConvFCHead,
MaskRCNNHeads, norm-layer aware) plus the static-shape target assignment/sampling
machinery that torchvision's dynamic-shape C++ ops provided.

Everything here keeps static shapes for XLA: matching produces per-anchor labels,
"sampling" produces 0/1 weight masks via randomized top-k instead of index lists.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cvnets_tpu.layers.conv_layer import BlockConvTranspose, ConvLayer2d
from cvnets_tpu.layers.dtype_utils import compute_dtype
from cvnets_tpu.layers.init_utils import linear_init
from cvnets_tpu.ops.box_utils import box_iou


# ------------------------------------------------------------------- heads


class RPNHead(nn.Module):
    """3×3 conv → 1×1 objectness + 1×1 box deltas, shared across levels.

    No normalization by default (reference rcnn_utils.py:51 uses use_norm=False;
    norm is opt-in via --model.detection.mask-rcnn.norm-layer). BN here is also
    actively harmful: RoI batches are tiny and train/eval statistics diverge."""

    opts: Any
    in_channels: int
    num_anchors: int
    conv_depth: int = 1

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], training: bool = False
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        head_norm = getattr(self.opts, "model.detection.mask_rcnn.norm_layer", None)
        convs = [
            ConvLayer2d(opts=self.opts, out_channels=self.in_channels,
                        kernel_size=3, use_norm=head_norm is not None,
                        norm_name=head_norm, use_act=True, bias=head_norm is None,
                        name=f"conv_{i}")
            for i in range(self.conv_depth)
        ]
        # predictor convs start near zero (torchvision RPNHead init: normal
        # std=0.01, zero bias) — default kaiming-scale init puts initial box
        # deltas at O(5), landing smooth-L1 deep in its linear regime where
        # Adam limit-cycles instead of converging
        cls_logits = nn.Conv(self.num_anchors, (1, 1),
                             kernel_init=nn.initializers.normal(0.01),
                             dtype=compute_dtype(self.opts), name="cls_logits")
        bbox_pred = nn.Conv(self.num_anchors * 4, (1, 1),
                            kernel_init=nn.initializers.normal(0.01),
                            dtype=compute_dtype(self.opts), name="bbox_pred")
        logits, deltas = [], []
        for fm in features:
            t = fm
            for conv in convs:
                t = conv(t, training=training)
            logits.append(cls_logits(t))
            deltas.append(bbox_pred(t))
        return logits, deltas


class FastRCNNConvFCHead(nn.Module):
    """4×conv(+norm) → flatten → fc (reference rcnn_utils FastRCNNConvFCHead)."""

    opts: Any
    conv_channels: int = 256
    fc_dim: int = 1024
    n_convs: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        head_norm = getattr(self.opts, "model.detection.mask_rcnn.norm_layer", None)
        for i in range(self.n_convs):
            x = ConvLayer2d(opts=self.opts, out_channels=self.conv_channels,
                            kernel_size=3, use_norm=head_norm is not None,
                            norm_name=head_norm, use_act=True,
                            bias=head_norm is None,
                            name=f"conv_{i}")(x, training=training)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.fc_dim, kernel_init=linear_init(self.opts),
                     dtype=compute_dtype(self.opts), name="fc")(x)
        return nn.relu(x)


class FastRCNNPredictor(nn.Module):
    opts: Any
    n_classes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dt = compute_dtype(self.opts)
        # torchvision FastRCNNPredictor init: cls normal(0.01), bbox normal(0.001)
        scores = nn.Dense(self.n_classes,
                          kernel_init=nn.initializers.normal(0.01),
                          dtype=dt, name="cls_score")(x)
        deltas = nn.Dense(self.n_classes * 4,
                          kernel_init=nn.initializers.normal(0.001),
                          dtype=dt, name="bbox_pred")(x)
        return scores, deltas


class MaskRCNNHeads(nn.Module):
    """4×conv → deconv ×2 → 1×1 per-class mask logits."""

    opts: Any
    channels: int = 256
    n_convs: int = 4
    n_classes: int = 81

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        head_norm = getattr(self.opts, "model.detection.mask_rcnn.norm_layer", None)
        for i in range(self.n_convs):
            x = ConvLayer2d(opts=self.opts, out_channels=self.channels,
                            kernel_size=3, use_norm=head_norm is not None,
                            norm_name=head_norm, use_act=True,
                            bias=head_norm is None,
                            name=f"mask_fcn{i + 1}")(x, training=training)
        # 2x2-stride-2 transpose conv as einsum + depth-to-space (same param
        # tree as nn.ConvTranspose; see BlockConvTranspose for why)
        x = BlockConvTranspose(self.channels, (2, 2),
                               dtype=compute_dtype(self.opts),
                               name="deconv")(x)
        x = nn.relu(x)
        return ConvLayer2d(opts=self.opts, out_channels=self.n_classes,
                           kernel_size=1, use_norm=False, use_act=False, bias=True,
                           name="mask_logits")(x, training=training)


# ------------------------------------------------- box coding (R-CNN weights)

BBOX_XFORM_CLIP = float(np.log(1000.0 / 16))


def encode_boxes(ref_boxes: jnp.ndarray, gt_boxes: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """xyxy -> (dx, dy, dw, dh) deltas (torchvision BoxCoder semantics)."""
    wx, wy, ww, wh = weights
    ex_w = ref_boxes[..., 2] - ref_boxes[..., 0]
    ex_h = ref_boxes[..., 3] - ref_boxes[..., 1]
    ex_cx = ref_boxes[..., 0] + 0.5 * ex_w
    ex_cy = ref_boxes[..., 1] + 0.5 * ex_h
    gt_w = jnp.maximum(gt_boxes[..., 2] - gt_boxes[..., 0], 1e-4)
    gt_h = jnp.maximum(gt_boxes[..., 3] - gt_boxes[..., 1], 1e-4)
    gt_cx = gt_boxes[..., 0] + 0.5 * gt_w
    gt_cy = gt_boxes[..., 1] + 0.5 * gt_h
    return jnp.stack([
        wx * (gt_cx - ex_cx) / jnp.maximum(ex_w, 1e-4),
        wy * (gt_cy - ex_cy) / jnp.maximum(ex_h, 1e-4),
        ww * jnp.log(gt_w / jnp.maximum(ex_w, 1e-4)),
        wh * jnp.log(gt_h / jnp.maximum(ex_h, 1e-4)),
    ], axis=-1)


def decode_boxes(deltas: jnp.ndarray, ref_boxes: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    wx, wy, ww, wh = weights
    w = ref_boxes[..., 2] - ref_boxes[..., 0]
    h = ref_boxes[..., 3] - ref_boxes[..., 1]
    cx = ref_boxes[..., 0] + 0.5 * w
    cy = ref_boxes[..., 1] + 0.5 * h
    dx, dy, dw, dh = [deltas[..., i] for i in range(4)]
    dw = jnp.clip(dw / ww, max=BBOX_XFORM_CLIP)
    dh = jnp.clip(dh / wh, max=BBOX_XFORM_CLIP)
    pcx = cx + dx / wx * w
    pcy = cy + dy / wy * h
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1)


# ----------------------------------------- matching + balanced sampling (static)


def match_boxes(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                gt_valid: jnp.ndarray, high: float, low: float
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-anchor match: returns (matched_gt_idx, label) with label 1 pos / 0 neg /
    -1 ignore; force-matches each valid gt's best anchor (torchvision Matcher with
    allow_low_quality_matches)."""
    ious = box_iou(anchors, gt_boxes)  # (A, G)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    best_iou = jnp.max(ious, axis=1)
    best_idx = jnp.argmax(ious, axis=1)
    labels = jnp.where(best_iou >= high, 1,
                       jnp.where(best_iou < low, 0, -1))
    # low-quality forcing: anchors achieving a gt's max IoU become positive
    gt_best = jnp.max(ious, axis=0)  # (G,)
    force = jnp.any(
        (ious >= gt_best[None, :] - 1e-5) & gt_valid[None, :] & (gt_best[None, :] > 0),
        axis=1,
    )
    labels = jnp.where(force, 1, labels)
    return best_idx, labels


def balanced_sample_mask(rng, labels: jnp.ndarray, num_samples: int,
                         pos_fraction: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """0/1 masks (pos_mask, neg_mask) selecting ≤num_samples anchors with the given
    positive fraction — randomized top-k replaces index sampling (static shapes)."""
    n_pos_target = int(num_samples * pos_fraction)
    pos = labels == 1
    neg = labels == 0
    key_p, key_n = jax.random.split(rng)
    rand_p = jax.random.uniform(key_p, labels.shape)
    rand_n = jax.random.uniform(key_n, labels.shape)
    # rank positives randomly among themselves
    p_rank = jnp.argsort(jnp.argsort(jnp.where(pos, rand_p, 2.0)))
    n_pos = jnp.minimum(jnp.sum(pos), n_pos_target)
    pos_mask = pos & (p_rank < n_pos)
    n_neg_target = num_samples - n_pos
    n_rank = jnp.argsort(jnp.argsort(jnp.where(neg, rand_n, 2.0)))
    n_neg = jnp.minimum(jnp.sum(neg), n_neg_target)
    neg_mask = neg & (n_rank < n_neg)
    return pos_mask, neg_mask
