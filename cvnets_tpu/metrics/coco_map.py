"""COCO-style mAP, natively in numpy (replaces pycocotools' COCOeval C extension —
not available in this environment; parity target: reference metrics/coco_map.py:27).

Implements the full COCO protocol: AP averaged over IoU thresholds 0.50:0.05:0.95,
101-point interpolated PR curves, per-class then mean, greedy highest-IoU matching
of score-sorted detections preferring non-ignored gt, crowd-gt ignore semantics
(crowd IoU = intersection / det area, reusable matches), area ranges
(all/small/medium/large), maxDets truncation, average recall, and both ``bbox``
and ``segm`` IoU types (binary-mask IoU — no RLE).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from cvnets_tpu.metrics import METRICS_REGISTRY
from cvnets_tpu.metrics.metric_base import BaseMetric

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = 100


def _box_iou_np(a: np.ndarray, b: np.ndarray, b_crowd: np.ndarray) -> np.ndarray:
    """IoU (A, B); for crowd gt the denominator is the detection area
    (pycocotools iscrowd convention)."""
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    denom = np.where(b_crowd[None, :], area_a[:, None], union)
    return inter / np.maximum(denom, 1e-9)


def _mask_iou_np(a: List[np.ndarray], b: List[np.ndarray], b_crowd: np.ndarray
                 ) -> np.ndarray:
    out = np.zeros((len(a), len(b)))
    a_bin = [np.asarray(m) > 0.5 for m in a]
    b_bin = [np.asarray(m) > 0.5 for m in b]
    for i, ma in enumerate(a_bin):
        area_a = float(ma.sum())
        for j, mb in enumerate(b_bin):
            inter = float(np.logical_and(ma, mb).sum())
            if b_crowd[j]:
                denom = area_a
            else:
                denom = area_a + float(mb.sum()) - inter
            out[i, j] = inter / max(denom, 1e-9)
    return out


def _evaluate_image(ious: np.ndarray, gt_ignore: np.ndarray, gt_crowd: np.ndarray,
                    det_out_of_range: np.ndarray,
                    iou_thresholds: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy matching (pycocotools evaluateImg): detections pre-sorted by score,
    gt pre-sorted non-ignored first. Returns (tp, dt_ignore) of shape (T, D)."""
    nd, ng = ious.shape
    nt = len(iou_thresholds)
    tp = np.zeros((nt, nd), bool)
    dt_ig = np.zeros((nt, nd), bool)
    for ti, thr in enumerate(iou_thresholds):
        gt_used = np.zeros(ng, bool)
        for d in range(nd):
            best, best_iou = -1, min(thr, 1 - 1e-10)
            for g in range(ng):
                if gt_used[g] and not gt_crowd[g]:
                    continue
                # gt are sorted non-ignored first: once matched to a
                # non-ignored gt, never switch to an ignored one
                if best > -1 and not gt_ignore[best] and gt_ignore[g]:
                    break
                if ious[d, g] < best_iou:
                    continue
                best_iou = ious[d, g]
                best = g
            if best == -1:
                dt_ig[ti, d] = det_out_of_range[d]
                continue
            gt_used[best] = True
            dt_ig[ti, d] = gt_ignore[best]
            tp[ti, d] = not gt_ignore[best]
    return tp, dt_ig


def _area_of(boxes: np.ndarray) -> np.ndarray:
    return np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * np.clip(
        boxes[:, 3] - boxes[:, 1], 0, None)


def compute_coco_map(
    detections: List[Dict], ground_truths: List[Dict],
    iou_thresholds: np.ndarray = IOU_THRESHOLDS,
    iou_type: str = "bbox",
    max_dets: int = MAX_DETS,
    area_ranges: Optional[Sequence[str]] = ("all", "small", "medium", "large"),
) -> Dict[str, float]:
    """detections: per image {"boxes" (N,4 xyxy abs), "scores" (N,), "labels" (N,),
    optional "masks" (list/array of HxW binary masks)};
    ground_truths: per image {"boxes", "labels", optional "iscrowd", "masks"}.

    Returns {"<iou_type>": mAP@[.5:.95], "<iou_type>_50", "<iou_type>_75",
    "<iou_type>_small/medium/large", "<iou_type>_ar_100"} in [0, 1].
    """
    assert len(detections) == len(ground_truths)
    key = iou_type
    classes = sorted({int(l) for gt in ground_truths for l in gt["labels"]})
    zero = {key: 0.0, f"{key}_50": 0.0, f"{key}_75": 0.0}
    if not classes:
        return zero

    results: Dict[str, float] = {}
    nt = len(iou_thresholds)
    for rng_name in (area_ranges or ("all",)):
        lo, hi = AREA_RANGES[rng_name]
        ap = np.full((nt, len(classes)), np.nan)
        ar = np.full((nt, len(classes)), np.nan)
        for ci, cls in enumerate(classes):
            scores_acc: List[np.ndarray] = []
            tp_acc: List[np.ndarray] = []
            ig_acc: List[np.ndarray] = []
            n_gt = 0
            for det, gt in zip(detections, ground_truths):
                g_lab = np.asarray(gt["labels"]).reshape(-1)
                g_mask_sel = g_lab == cls
                g_boxes = np.asarray(gt["boxes"], np.float32).reshape(-1, 4)[g_mask_sel]
                g_crowd = np.asarray(
                    gt.get("iscrowd", np.zeros(len(g_lab))), bool)[g_mask_sel]
                if iou_type == "segm" and "masks" in gt:
                    g_geom = [m for m, s in zip(gt["masks"], g_mask_sel) if s]
                    g_area = np.asarray([float((np.asarray(m) > 0.5).sum())
                                         for m in g_geom])
                else:
                    g_geom = g_boxes
                    g_area = _area_of(g_boxes)
                g_ignore = g_crowd | (g_area < lo) | (g_area > hi)
                # sort gt: non-ignored first (pycocotools gtind)
                order_g = np.argsort(g_ignore, kind="stable")
                g_boxes, g_crowd, g_ignore = (g_boxes[order_g], g_crowd[order_g],
                                              g_ignore[order_g])
                if iou_type == "segm" and "masks" in gt:
                    g_geom = [g_geom[i] for i in order_g]
                else:
                    g_geom = g_boxes
                n_gt += int((~g_ignore).sum())

                d_lab = np.asarray(det["labels"]).reshape(-1)
                d_sel = d_lab == cls
                d_boxes = np.asarray(det["boxes"], np.float32).reshape(-1, 4)[d_sel]
                d_scores = np.asarray(det["scores"], np.float32)[d_sel]
                order_d = np.argsort(-d_scores, kind="stable")[:max_dets]
                d_boxes, d_scores = d_boxes[order_d], d_scores[order_d]
                if iou_type == "segm" and "masks" in det:
                    d_all = [m for m, s in zip(det["masks"], d_sel) if s]
                    d_geom = [d_all[i] for i in order_d]
                    d_area = np.asarray([float((np.asarray(m) > 0.5).sum())
                                         for m in d_geom])
                else:
                    d_geom = d_boxes
                    d_area = _area_of(d_boxes)
                d_oor = (d_area < lo) | (d_area > hi)

                if iou_type == "segm" and ("masks" in det or "masks" in gt):
                    ious = _mask_iou_np(d_geom, g_geom, g_crowd)
                else:
                    ious = _box_iou_np(d_boxes, g_boxes, g_crowd)
                tp, dt_ig = _evaluate_image(ious, g_ignore, g_crowd, d_oor,
                                            iou_thresholds)
                scores_acc.append(d_scores)
                tp_acc.append(tp)
                ig_acc.append(dt_ig)
            if n_gt == 0:
                continue
            scores = np.concatenate(scores_acc) if scores_acc else np.zeros(0)
            tps = (np.concatenate(tp_acc, axis=1) if tp_acc
                   else np.zeros((nt, 0), bool))
            igs = (np.concatenate(ig_acc, axis=1) if ig_acc
                   else np.zeros((nt, 0), bool))
            order = np.argsort(-scores, kind="mergesort")
            tps, igs = tps[:, order], igs[:, order]
            for ti in range(nt):
                keep = ~igs[ti]
                t = tps[ti][keep]
                tp_cum = np.cumsum(t)
                fp_cum = np.cumsum(~t)
                recall = tp_cum / n_gt
                precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
                ar[ti, ci] = recall[-1] if len(recall) else 0.0
                if len(precision) == 0:
                    ap[ti, ci] = 0.0
                    continue
                for i in range(len(precision) - 2, -1, -1):
                    precision[i] = max(precision[i], precision[i + 1])
                idx = np.searchsorted(recall, RECALL_POINTS, side="left")
                prec_at = np.where(
                    idx < len(precision),
                    precision[np.minimum(idx, len(precision) - 1)], 0.0)
                ap[ti, ci] = prec_at.mean()

        valid = ~np.isnan(ap[0])
        suffix = "" if rng_name == "all" else f"_{rng_name}"
        if valid.any():
            results[f"{key}{suffix}"] = float(np.nanmean(ap[:, valid]))
            if rng_name == "all":
                results[f"{key}_50"] = float(np.nanmean(ap[0, valid]))
                results[f"{key}_75"] = float(np.nanmean(ap[5, valid]))
                results[f"{key}_ar_{max_dets}"] = float(np.nanmean(ar[:, valid]))
        else:
            results[f"{key}{suffix}"] = 0.0
            if rng_name == "all":
                results[f"{key}_50"] = 0.0
                results[f"{key}_75"] = 0.0
                results[f"{key}_ar_{max_dets}"] = 0.0
    return results


@METRICS_REGISTRY.register(name="coco_map")
class COCOMapMetric(BaseMetric):
    """Accumulates per-image detections + gt host-side; computes at epoch end
    (EpochMetric aggregation strategy, reference metrics/coco_map.py)."""

    def __init__(self, opts=None, **kwargs) -> None:
        self.iou_types = getattr(opts, "stats.coco_map.iou_types", ["bbox"]) \
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
        out: Dict[str, float] = {}
        for iou_type in self.iou_types:
            res = compute_coco_map(self._dets, self._gts, iou_type=iou_type)
            out.update({k: v * 100.0 for k, v in res.items()})
        return out
