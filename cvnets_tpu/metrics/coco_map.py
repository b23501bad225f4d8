"""COCO-style mAP, natively in numpy (replaces pycocotools' COCOeval C extension —
not available in this environment; parity target: reference metrics/coco_map.py:27).

Implements the standard COCO protocol: AP averaged over IoU thresholds
0.50:0.05:0.95, 101-point interpolated PR curves, per-class then mean, with
greedy highest-IoU matching of score-sorted detections; crowd/ignored gt supported.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from cvnets_tpu.metrics import METRICS_REGISTRY
from cvnets_tpu.metrics.metric_base import BaseMetric

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _box_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def _match_image(det_boxes, det_scores, gt_boxes, gt_ignore, iou_thr):
    """Greedy matching for one image/class at one IoU threshold.

    Returns (tp flags, matched-ignore flags) aligned with score-sorted detections.
    """
    nd, ng = len(det_boxes), len(gt_boxes)
    tp = np.zeros(nd, bool)
    ignored = np.zeros(nd, bool)
    if ng == 0:
        return tp, ignored
    ious = _box_iou_np(det_boxes, gt_boxes)
    gt_used = np.zeros(ng, bool)
    for d in range(nd):
        # prefer non-ignored gt; fall back to ignored
        best, best_iou = -1, iou_thr
        for g in range(ng):
            if gt_used[g] and not gt_ignore[g]:
                continue
            if ious[d, g] >= best_iou:
                # prefer non-ignored matches
                if best >= 0 and gt_ignore[g] and not gt_ignore[best]:
                    continue
                best, best_iou = g, ious[d, g]
        if best >= 0:
            if gt_ignore[best]:
                ignored[d] = True
            else:
                gt_used[best] = True
                tp[d] = True
    return tp, ignored


def compute_coco_map(
    detections: List[Dict], ground_truths: List[Dict],
    iou_thresholds: np.ndarray = IOU_THRESHOLDS,
) -> Dict[str, float]:
    """detections: per image {"boxes" (N,4 xyxy abs), "scores" (N,), "labels" (N,)};
    ground_truths: per image {"boxes", "labels", optional "iscrowd"}.

    Returns {"bbox": mAP@[.5:.95], "bbox_50": AP50, "bbox_75": AP75} in [0, 1].
    """
    assert len(detections) == len(ground_truths)
    classes = sorted({int(l) for gt in ground_truths for l in gt["labels"]})
    if not classes:
        return {"bbox": 0.0, "bbox_50": 0.0, "bbox_75": 0.0}

    ap = np.zeros((len(iou_thresholds), len(classes)))
    valid = np.zeros(len(classes), bool)
    for ci, cls in enumerate(classes):
        all_scores, all_tp = [[] for _ in iou_thresholds], [[] for _ in iou_thresholds]
        n_gt = 0
        for det, gt in zip(detections, ground_truths):
            g_mask = np.asarray(gt["labels"]) == cls
            g_boxes = np.asarray(gt["boxes"], np.float32).reshape(-1, 4)[g_mask]
            g_ignore = np.asarray(
                gt.get("iscrowd", np.zeros(len(gt["labels"]))), bool
            )[g_mask]
            n_gt += int((~g_ignore).sum())
            d_mask = np.asarray(det["labels"]) == cls
            d_boxes = np.asarray(det["boxes"], np.float32).reshape(-1, 4)[d_mask]
            d_scores = np.asarray(det["scores"], np.float32)[d_mask]
            order = np.argsort(-d_scores)
            d_boxes, d_scores = d_boxes[order], d_scores[order]
            for ti, thr in enumerate(iou_thresholds):
                tp, ign = _match_image(d_boxes, d_scores, g_boxes, g_ignore, thr)
                keep = ~ign
                all_scores[ti].append(d_scores[keep])
                all_tp[ti].append(tp[keep])
        if n_gt == 0:
            continue
        valid[ci] = True
        for ti in range(len(iou_thresholds)):
            scores = np.concatenate(all_scores[ti]) if all_scores[ti] else np.zeros(0)
            tps = np.concatenate(all_tp[ti]) if all_tp[ti] else np.zeros(0, bool)
            order = np.argsort(-scores)
            tps = tps[order]
            tp_cum = np.cumsum(tps)
            fp_cum = np.cumsum(~tps)
            recall = tp_cum / n_gt
            precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
            # monotonically decreasing precision envelope
            for i in range(len(precision) - 2, -1, -1):
                precision[i] = max(precision[i], precision[i + 1])
            # 101-point interpolation
            if len(precision) == 0:
                ap[ti, ci] = 0.0
                continue
            idx = np.searchsorted(recall, RECALL_POINTS, side="left")
            prec_at = np.where(
                idx < len(precision),
                precision[np.minimum(idx, len(precision) - 1)], 0.0,
            )
            ap[ti, ci] = prec_at.mean()

    ap_valid = ap[:, valid]
    return {
        "bbox": float(ap_valid.mean()) if ap_valid.size else 0.0,
        "bbox_50": float(ap_valid[0].mean()) if ap_valid.size else 0.0,
        "bbox_75": float(ap_valid[5].mean()) if ap_valid.size else 0.0,
    }


@METRICS_REGISTRY.register(name="coco_map")
class COCOMapMetric(BaseMetric):
    """Accumulates per-image detections + gt host-side; computes at epoch end
    (EpochMetric aggregation strategy, reference metrics/coco_map.py)."""

    def __init__(self, opts=None, **kwargs) -> None:
        self.include_masks = getattr(opts, "stats.coco_map.iou_types", ["bbox"]) \
            if opts else ["bbox"]
        super().__init__(opts, **kwargs)

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--stats.coco-map.iou-types", type=str, nargs="+",
                           default=["bbox"])
        return parser

    def reset(self) -> None:
        self._dets: List[Dict] = []
        self._gts: List[Dict] = []

    def update(self, prediction, target, extras=None, batch_size: int = 1) -> None:
        """prediction: dict with per-image numpy boxes/scores/labels lists;
        target: matching gt dicts."""
        if isinstance(prediction, dict):
            prediction = [prediction]
            target = [target]
        self._dets.extend(prediction)
        self._gts.extend(target)

    def compute(self) -> Dict[str, float]:
        if not self._dets:
            return {"bbox": 0.0}
        res = compute_coco_map(self._dets, self._gts)
        return {k: v * 100.0 for k, v in res.items()}
