"""Independent COCOeval port used ONLY as a test oracle.

A deliberately direct transcription of the published pycocotools COCOeval
algorithm (cocoeval.py upstream; the env has no pycocotools): COCO-json-style
annotation lists in, the (T, R, K, A, M) precision/recall tensors out. It
shares NO code or data layout with ``cvnets_tpu/metrics/coco_map.py`` — that
implementation batches per image with vectorized IoU; this one walks
annotation dicts per (category, area-range, image) exactly like upstream, so
agreement between the two is evidence each implements the protocol, not that
they share a bug.

Inputs mirror COCO results format:
    gts:  [{"id", "image_id", "category_id", "bbox" [x,y,w,h], "area",
            "iscrowd", optional "mask" (HxW binary np array)}]
    dts:  [{"id", "image_id", "category_id", "bbox", "score",
            optional "mask"}]
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {
    "all": [0.0, 1e10],
    "small": [0.0, 32.0 ** 2],
    "medium": [32.0 ** 2, 96.0 ** 2],
    "large": [96.0 ** 2, 1e10],
}


def _iou_boxes(d: List[List[float]], g: List[List[float]],
               iscrowd: List[int]) -> np.ndarray:
    """xywh box IoU with the crowd convention (denominator = det area)."""
    ious = np.zeros((len(d), len(g)))
    for j, gb in enumerate(g):
        gx, gy, gw, gh = gb
        garea = gw * gh
        for i, db in enumerate(d):
            dx, dy, dw, dh = db
            darea = dw * dh
            iw = min(dx + dw, gx + gw) - max(dx, gx)
            if iw <= 0:
                continue
            ih = min(dy + dh, gy + gh) - max(dy, gy)
            if ih <= 0:
                continue
            inter = iw * ih
            union = darea if iscrowd[j] else darea + garea - inter
            ious[i, j] = inter / union
    return ious


def _iou_masks(d: List[np.ndarray], g: List[np.ndarray],
               iscrowd: List[int]) -> np.ndarray:
    ious = np.zeros((len(d), len(g)))
    for j, gm in enumerate(g):
        gm = np.asarray(gm) > 0.5
        for i, dm in enumerate(d):
            dm = np.asarray(dm) > 0.5
            inter = float(np.logical_and(dm, gm).sum())
            union = (float(dm.sum()) if iscrowd[j]
                     else float(dm.sum()) + float(gm.sum()) - inter)
            ious[i, j] = inter / union if union > 0 else 0.0
    return ious


class RefCOCOeval:
    """The upstream evaluate()/accumulate()/summarize() pipeline."""

    def __init__(self, gts: List[Dict], dts: List[Dict],
                 iou_type: str = "bbox", max_dets: int = 100) -> None:
        self.iou_type = iou_type
        self.max_dets = max_dets
        self.img_ids = sorted({a["image_id"] for a in gts}
                              | {a["image_id"] for a in dts})
        self.cat_ids = sorted({a["category_id"] for a in gts})
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for a in gts:
            a.setdefault("iscrowd", 0)
            if "area" not in a:
                a["area"] = a["bbox"][2] * a["bbox"][3]
            a["ignore"] = a.get("ignore", 0) or a["iscrowd"]
            self._gts[a["image_id"], a["category_id"]].append(a)
        for a in dts:
            if "area" not in a:
                if iou_type == "segm" and "mask" in a:
                    a["area"] = float((np.asarray(a["mask"]) > 0.5).sum())
                else:
                    a["area"] = a["bbox"][2] * a["bbox"][3]
            self._dts[a["image_id"], a["category_id"]].append(a)

    # -- computeIoU (per image, category) ---------------------------------
    def _compute_iou(self, img_id, cat_id) -> np.ndarray:
        gt = self._gts[img_id, cat_id]
        dt = self._dts[img_id, cat_id]
        if len(gt) == 0 or len(dt) == 0:
            return np.zeros((len(dt), len(gt)))
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds[0: self.max_dets]]
        iscrowd = [int(o["iscrowd"]) for o in gt]
        if self.iou_type == "segm":
            return _iou_masks([d["mask"] for d in dt],
                              [g["mask"] for g in gt], iscrowd)
        return _iou_boxes([d["bbox"] for d in dt],
                          [g["bbox"] for g in gt], iscrowd)

    # -- evaluateImg ------------------------------------------------------
    def _evaluate_img(self, img_id, cat_id, a_rng, ious_full) -> Optional[Dict]:
        gt = self._gts[img_id, cat_id]
        dt = self._dts[img_id, cat_id]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            g["_ignore"] = (g["ignore"]
                            or g["area"] < a_rng[0] or g["area"] > a_rng[1])
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[0: self.max_dets]]
        iscrowd = [int(o["iscrowd"]) for o in gt]
        ious = (ious_full[:, gtind] if len(ious_full) > 0 else ious_full)

        T = len(IOU_THRS)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gt_ig = np.array([g["_ignore"] for g in gt])
        dt_ig = np.zeros((T, D))
        if len(ious) > 0:
            for tind, t in enumerate(IOU_THRS):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dt_ig[tind, dind] = gt_ig[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array([d["area"] < a_rng[0] or d["area"] > a_rng[1]
                      for d in dt]).reshape((1, len(dt)))
        dt_ig = np.logical_or(dt_ig, np.logical_and(
            dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtMatches": dtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gt_ig,
            "dtIgnore": dt_ig,
        }

    # -- accumulate -------------------------------------------------------
    def run(self) -> Dict[str, float]:
        T, R = len(IOU_THRS), len(REC_THRS)
        K = len(self.cat_ids)
        area_names = list(AREA_RNG)
        A = len(area_names)
        precision = -np.ones((T, R, K, A))
        recall = -np.ones((T, K, A))

        ious = {(i, c): self._compute_iou(i, c)
                for i in self.img_ids for c in self.cat_ids}

        for k, cat in enumerate(self.cat_ids):
            for a, aname in enumerate(area_names):
                a_rng = AREA_RNG[aname]
                E = [self._evaluate_img(i, cat, a_rng, ious[i, cat])
                     for i in self.img_ids]
                E = [e for e in E if e is not None]
                if len(E) == 0:
                    continue
                dt_scores = np.concatenate(
                    [np.asarray(e["dtScores"]) for e in E])
                inds = np.argsort(-dt_scores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dtMatches"] for e in E], axis=1)[:, inds]
                dt_ig = np.concatenate(
                    [e["dtIgnore"] for e in E], axis=1)[:, inds]
                gt_ig = np.concatenate([e["gtIgnore"] for e in E])
                npig = int(np.count_nonzero(gt_ig == 0))
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(
                    np.logical_not(dtm), np.logical_not(dt_ig))
                tp_sum = np.cumsum(tps, axis=1).astype(float)
                fp_sum = np.cumsum(fps, axis=1).astype(float)
                for t in range(T):
                    tp = np.array(tp_sum[t])
                    fp = np.array(fp_sum[t])
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros((R,))
                    recall[t, k, a] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds2 = np.searchsorted(rc, REC_THRS, side="left")
                    try:
                        for ri, pi in enumerate(inds2):
                            q[ri] = pr[pi]
                    except IndexError:
                        pass
                    precision[t, :, k, a] = np.array(q)

        def _summ(prec_or_rec, tind=None, aind=0):
            s = prec_or_rec
            if tind is not None:
                s = s[[tind]]
            s = s[..., aind] if s.ndim == 3 else s[:, :, :, aind]
            s = s[s > -1]
            return float(np.mean(s)) if s.size else 0.0

        out = {
            "map": _summ(precision),
            "map_50": _summ(precision, tind=0),
            "map_75": _summ(precision, tind=5),
            "map_small": _summ(precision, aind=1),
            "map_medium": _summ(precision, aind=2),
            "map_large": _summ(precision, aind=3),
            "ar_100": _summ(recall),
        }
        return out
