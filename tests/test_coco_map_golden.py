"""Golden validation of the native COCO mAP against an independent COCOeval
port (VERDICT r1 #2): `cvnets_tpu/metrics/coco_map.py` (vectorized, per-image
batched) must agree with `tests/ref_cocoeval.py` (direct pycocotools-algorithm
transcription over annotation dicts) on randomized fixtures and on the corner
cases where reimplementations classically diverge: crowd gt, area-range
ignores, maxDets truncation, score ties, det-only/gt-only images, segm IoU."""

from __future__ import annotations

import numpy as np
import pytest

from cvnets_tpu.metrics.coco_map import compute_coco_map

from tests.ref_cocoeval import RefCOCOeval

KEYMAP = {
    "bbox": "map", "bbox_50": "map_50", "bbox_75": "map_75",
    "bbox_small": "map_small", "bbox_medium": "map_medium",
    "bbox_large": "map_large", "bbox_ar_100": "ar_100",
}


def _to_coco_lists(dets, gts):
    """Convert our per-image dict format into COCO-style annotation lists."""
    gt_anns, dt_anns = [], []
    gid = 1
    for img_id, gt in enumerate(gts):
        boxes = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)
        labels = np.asarray(gt["labels"]).reshape(-1)
        crowd = np.asarray(gt.get("iscrowd", np.zeros(len(labels)))).reshape(-1)
        masks = gt.get("masks")
        for i in range(len(labels)):
            x1, y1, x2, y2 = boxes[i]
            ann = {"id": gid, "image_id": img_id,
                   "category_id": int(labels[i]),
                   "bbox": [x1, y1, x2 - x1, y2 - y1],
                   "iscrowd": int(crowd[i])}
            if masks is not None:
                ann["mask"] = masks[i]
                ann["area"] = float((np.asarray(masks[i]) > 0.5).sum())
            gid += 1
            gt_anns.append(ann)
    for img_id, det in enumerate(dets):
        boxes = np.asarray(det["boxes"], np.float64).reshape(-1, 4)
        labels = np.asarray(det["labels"]).reshape(-1)
        scores = np.asarray(det["scores"], np.float64).reshape(-1)
        masks = det.get("masks")
        for i in range(len(labels)):
            x1, y1, x2, y2 = boxes[i]
            ann = {"id": gid, "image_id": img_id,
                   "category_id": int(labels[i]),
                   "bbox": [x1, y1, x2 - x1, y2 - y1],
                   "score": float(scores[i])}
            if masks is not None:
                ann["mask"] = masks[i]
            gid += 1
            dt_anns.append(ann)
    return dt_anns, gt_anns


def _assert_agree(dets, gts, iou_type="bbox", max_dets=100, atol=1e-8):
    ours = compute_coco_map(dets, gts, iou_type=iou_type, max_dets=max_dets)
    dt_anns, gt_anns = _to_coco_lists(dets, gts)
    ref = RefCOCOeval(gt_anns, dt_anns, iou_type=iou_type,
                      max_dets=max_dets).run()
    for our_key, ref_key in KEYMAP.items():
        k = our_key.replace("bbox", iou_type)
        if k not in ours:
            continue
        rk = ref_key if max_dets == 100 else ref_key.replace("100",
                                                             str(max_dets))
        if rk not in ref:
            rk = ref_key
        assert ours[k] == pytest.approx(ref[rk], abs=atol), (
            k, ours[k], ref[rk])


def _rand_fixture(rng, n_imgs=6, n_classes=4, img=400, max_gt=12, max_dt=20,
                  crowd_p=0.15, tie_scores=False, size_spread=True):
    dets, gts = [], []
    for _ in range(n_imgs):
        ng = int(rng.integers(0, max_gt + 1))
        nd = int(rng.integers(0, max_dt + 1))

        def boxes(n):
            xy = rng.uniform(0, img * 0.8, (n, 2))
            if size_spread:
                # hit all three area buckets: tiny (<32^2), mid, large (>96^2)
                wh = np.exp(rng.uniform(np.log(4), np.log(200), (n, 2)))
            else:
                wh = rng.uniform(10, 120, (n, 2))
            return np.concatenate([xy, xy + wh], axis=1)

        g_boxes = boxes(ng)
        g_labels = rng.integers(1, n_classes + 1, ng)
        gts.append({
            "boxes": g_boxes,
            "labels": g_labels,
            "iscrowd": (rng.random(ng) < crowd_p).astype(np.int64),
        })
        # half the detections perturb a gt box (same class -> real TP/FP
        # boundary cases), half noise
        d_boxes = boxes(nd)
        d_labels = rng.integers(1, n_classes + 1, nd)
        for i in range(nd // 2):
            if ng:
                gi = int(rng.integers(ng))
                src = g_boxes[gi]
                d_labels[i] = g_labels[gi]
                # jitter scaled to box size: plenty of matches above (and
                # straddling) the 0.5..0.95 IoU thresholds
                side = max(float(min(src[2] - src[0], src[3] - src[1])), 2.0)
                jitter = rng.normal(0, 0.08 * side, 4)
                d_boxes[i] = src + jitter
                d_boxes[i, 2:] = np.maximum(d_boxes[i, 2:],
                                            d_boxes[i, :2] + 1)
        scores = rng.random(nd)
        if tie_scores:
            scores = np.round(scores * 8) / 8.0
        dets.append({
            "boxes": d_boxes,
            "labels": d_labels,
            "scores": scores,
        })
    return dets, gts


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_fixtures_agree(seed):
    rng = np.random.default_rng(seed)
    dets, gts = _rand_fixture(rng)
    _assert_agree(dets, gts)


def test_score_ties_and_maxdets_truncation():
    rng = np.random.default_rng(7)
    dets, gts = _rand_fixture(rng, n_imgs=4, max_dt=30, tie_scores=True)
    _assert_agree(dets, gts, max_dets=5)


def test_all_crowd_and_extreme_areas():
    rng = np.random.default_rng(11)
    dets, gts = _rand_fixture(rng, crowd_p=0.8)
    _assert_agree(dets, gts)


def test_det_only_and_gt_only_images():
    gts = [
        {"boxes": np.array([[10., 10., 60., 60.]]), "labels": np.array([1]),
         "iscrowd": np.array([0])},
        {"boxes": np.zeros((0, 4)), "labels": np.zeros((0,), np.int64),
         "iscrowd": np.zeros((0,), np.int64)},
        {"boxes": np.array([[5., 5., 200., 200.]]), "labels": np.array([2]),
         "iscrowd": np.array([0])},
    ]
    dets = [
        {"boxes": np.zeros((0, 4)), "labels": np.zeros((0,), np.int64),
         "scores": np.zeros((0,))},
        {"boxes": np.array([[15., 15., 70., 70.]]), "labels": np.array([1]),
         "scores": np.array([0.9])},
        {"boxes": np.array([[6., 4., 190., 210.]]), "labels": np.array([2]),
         "scores": np.array([0.8])},
    ]
    _assert_agree(dets, gts)


def test_duplicate_detections_on_one_gt():
    """Only the best-scoring duplicate is a TP; crowds absorb duplicates."""
    for crowd in (0, 1):
        gts = [{"boxes": np.array([[10., 10., 110., 110.]]),
                "labels": np.array([1]), "iscrowd": np.array([crowd])}]
        dets = [{"boxes": np.array([[10., 10., 110., 110.]] * 4)
                 + np.arange(4)[:, None] * 1.0,
                 "labels": np.ones(4, np.int64),
                 "scores": np.array([0.9, 0.8, 0.7, 0.6])}]
        _assert_agree(dets, gts)


def test_segm_iou_agrees():
    rng = np.random.default_rng(3)
    H = W = 64
    gts, dets = [], []
    for _ in range(3):
        ng, nd = int(rng.integers(1, 4)), int(rng.integers(1, 5))

        def blobs(n):
            ms, bxs = [], []
            for _ in range(n):
                m = np.zeros((H, W), bool)
                x, y = rng.integers(0, W - 16), rng.integers(0, H - 16)
                w, h = rng.integers(4, 16), rng.integers(4, 16)
                m[y:y + h, x:x + w] = True
                ms.append(m)
                bxs.append([x, y, x + w, y + h])
            return ms, np.asarray(bxs, np.float64)

        g_masks, g_boxes = blobs(ng)
        d_masks, d_boxes = blobs(nd)
        gts.append({"boxes": g_boxes, "labels": rng.integers(1, 3, ng),
                    "iscrowd": (rng.random(ng) < 0.3).astype(np.int64),
                    "masks": g_masks})
        dets.append({"boxes": d_boxes, "labels": rng.integers(1, 3, nd),
                     "scores": rng.random(nd), "masks": d_masks})
    _assert_agree(dets, gts, iou_type="segm")
