"""Analytic validation of the native COCOeval (VERDICT r1 item 5).

pycocotools is not installed in this environment, so instead of recorded golden
numbers these fixtures are constructed so the COCO-protocol result is derivable
by hand (exact PR curves over the 101-point grid). Each expected value below is
the number pycocotools would print for the same inputs.
"""

import numpy as np
import pytest

from cvnets_tpu.metrics.coco_map import compute_coco_map


def _det(boxes, scores, labels, masks=None):
    d = {"boxes": np.asarray(boxes, np.float32),
         "scores": np.asarray(scores, np.float32),
         "labels": np.asarray(labels)}
    if masks is not None:
        d["masks"] = masks
    return d


def _gt(boxes, labels, iscrowd=None, masks=None):
    g = {"boxes": np.asarray(boxes, np.float32), "labels": np.asarray(labels)}
    if iscrowd is not None:
        g["iscrowd"] = np.asarray(iscrowd)
    if masks is not None:
        g["masks"] = masks
    return g


def test_perfect_detections_map_one():
    dets = [_det([[10, 10, 50, 50], [60, 60, 120, 140]], [0.9, 0.8], [1, 2])]
    gts = [_gt([[10, 10, 50, 50], [60, 60, 120, 140]], [1, 2])]
    res = compute_coco_map(dets, gts)
    assert res["bbox"] == pytest.approx(1.0)
    assert res["bbox_50"] == pytest.approx(1.0)
    assert res["bbox_75"] == pytest.approx(1.0)
    assert res["bbox_ar_100"] == pytest.approx(1.0)


def test_partial_iou_counts_at_low_thresholds_only():
    # det IoU with gt = (40*28)/(40*40 + 40*28 - 40*28) = 0.70 exactly; use a
    # slightly larger overlap to be robust: overlap height 30 -> IoU = 0.75
    gt_box = [0, 0, 40, 40]
    det_box = [0, 10, 40, 50]  # IoU = (40*30)/(1600+1600-1200) = 0.6
    res = compute_coco_map([_det([det_box], [0.9], [1])], [_gt([gt_box], [1])])
    # TP at thresholds 0.50, 0.55, 0.60 -> 3/10 of thresholds have AP 1.0
    assert res["bbox_50"] == pytest.approx(1.0)
    assert res["bbox_75"] == pytest.approx(0.0)
    assert res["bbox"] == pytest.approx(3 / 10)


def test_false_positive_above_true_positive():
    # 2 gt, detections: one FP (score .9, no overlap) + one perfect TP (score .8)
    gts = [_gt([[0, 0, 40, 40], [100, 100, 140, 140]], [1, 1])]
    dets = [_det([[200, 200, 240, 240], [0, 0, 40, 40]], [0.9, 0.8], [1, 1])]
    res = compute_coco_map(dets, gts)
    # PR: after FP p=0 r=0; after TP p=0.5 r=0.5. Envelope: p=0.5 for r<=0.5.
    # 101-pt grid: 51 points at 0.5 -> AP = 51*0.5/101
    assert res["bbox_50"] == pytest.approx(51 * 0.5 / 101)
    assert res["bbox_ar_100"] == pytest.approx(0.5)


def test_crowd_gt_is_ignored_not_fp():
    # detection matching only a crowd gt: neither TP nor FP; the other gt missed
    gts = [_gt([[0, 0, 40, 40], [100, 100, 140, 140]], [1, 1], iscrowd=[1, 0])]
    dets = [_det([[0, 0, 40, 40]], [0.9], [1])]
    res = compute_coco_map(dets, gts)
    # only non-crowd gt counts (missed): AP 0, and the det is ignored (no FP)
    assert res["bbox"] == pytest.approx(0.0)
    # compare: same scenario with the crowd det counted as FP would still be 0 AP,
    # so also check a mixed case where ignoring matters:
    gts2 = [_gt([[0, 0, 40, 40], [100, 100, 140, 140]], [1, 1], iscrowd=[1, 0])]
    dets2 = [_det([[0, 0, 40, 40], [100, 100, 140, 140]], [0.9, 0.8], [1, 1])]
    res2 = compute_coco_map(dets2, gts2)
    # crowd-matched det ignored; remaining det is a perfect match of the only
    # counted gt -> AP 1.0
    assert res2["bbox"] == pytest.approx(1.0)


def test_area_ranges_partition():
    # one small (16x16=256 < 32^2) and one large (200x200 > 96^2) gt, both hit
    gts = [_gt([[0, 0, 16, 16], [50, 50, 250, 250]], [1, 1])]
    dets = [_det([[0, 0, 16, 16], [50, 50, 250, 250]], [0.9, 0.8], [1, 1])]
    res = compute_coco_map(dets, gts)
    assert res["bbox_small"] == pytest.approx(1.0)
    assert res["bbox_large"] == pytest.approx(1.0)
    assert res["bbox_medium"] == pytest.approx(0.0)  # no medium gt -> 0.0 sentinel
    # now miss the small one
    dets2 = [_det([[50, 50, 250, 250]], [0.8], [1])]
    res2 = compute_coco_map(dets2, gts)
    assert res2["bbox_small"] == pytest.approx(0.0)
    assert res2["bbox_large"] == pytest.approx(1.0)


def test_max_dets_truncation():
    # 1 gt; 101 detections, the TP ranked last by score -> truncated out at 100
    gt = [_gt([[0, 0, 40, 40]], [1])]
    boxes = [[200 + i, 200, 240 + i, 240] for i in range(100)] + [[0, 0, 40, 40]]
    scores = [0.9 - i * 0.001 for i in range(100)] + [0.5]
    det = [_det(boxes, scores, [1] * 101)]
    res = compute_coco_map(det, gt, max_dets=100)
    assert res["bbox"] == pytest.approx(0.0)
    res2 = compute_coco_map(det, gt, max_dets=101)
    assert res2["bbox_50"] > 0.0


def test_segm_iou_type_with_masks():
    h = w = 64
    m_gt = np.zeros((h, w)); m_gt[10:40, 10:40] = 1
    m_half = np.zeros((h, w)); m_half[10:40, 10:25] = 1  # IoU = 0.5
    gts = [_gt([[10, 10, 40, 40]], [1], masks=[m_gt])]
    dets_perfect = [_det([[10, 10, 40, 40]], [0.9], [1], masks=[m_gt.copy()])]
    res = compute_coco_map(dets_perfect, gts, iou_type="segm")
    assert res["segm"] == pytest.approx(1.0)
    dets_half = [_det([[10, 10, 40, 40]], [0.9], [1], masks=[m_half])]
    res2 = compute_coco_map(dets_half, gts, iou_type="segm")
    # mask IoU = 0.5 exactly -> TP at threshold 0.50 only (>= comparison)
    assert res2["segm_50"] == pytest.approx(1.0)
    assert res2["segm"] == pytest.approx(1 / 10)


def test_multi_image_cross_image_ranking():
    # scores interleave across images; protocol sorts globally.
    # img1: TP score 0.9 ; img2: FP score 0.95 + TP score 0.5; 2 gt total... use 3 gt
    gts = [_gt([[0, 0, 40, 40]], [1]),
           _gt([[0, 0, 40, 40], [100, 100, 140, 140]], [1, 1])]
    dets = [_det([[0, 0, 40, 40]], [0.9], [1]),
            _det([[300, 300, 340, 340], [0, 0, 40, 40]], [0.95, 0.5], [1, 1])]
    res = compute_coco_map(dets, gts)
    # global order: FP(.95), TP(.9), TP(.5); n_gt = 3
    # PR points: (r=0,p=0) -> (r=1/3, p=1/2) -> (r=2/3, p=2/3)
    # envelope: p=2/3 for r<=2/3, 0 beyond
    expected_ap50 = (np.linspace(0, 1, 101) <= 2 / 3 + 1e-9).sum() * (2 / 3) / 101
    assert res["bbox_50"] == pytest.approx(expected_ap50, abs=1e-6)
