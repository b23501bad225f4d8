"""Native Mask R-CNN (parity target: reference
cvnets/models/detection/mask_rcnn.py:263-924, which wraps
torchvision.models.detection.mask_rcnn.MaskRCNN — not available here, so RPN,
RoIAlign, box/mask heads and the training target machinery are built natively
with STATIC shapes throughout, the SURVEY's hardest-part (a)).

Static-shape design:
* gt comes padded to MAX_GT boxes per image (label 0 = padding),
* RPN keeps a fixed ``pre_nms_top_n`` then NMS to fixed ``post_nms_top_n``
  proposals (invalid slots carry zero boxes),
* proposal sampling uses randomized-rank 0/1 masks instead of index lists,
* the mask head runs on a fixed number of positive slots.

Forward (training) returns {"losses": {...}} consumed by MaskRCNNLoss; inference
``predict`` returns a DetectionPredTuple with per-class NMS'd boxes and masks.
"""

from __future__ import annotations

import argparse
import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cvnets_tpu.constants import if_test_env
from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.detection import DetectionPredTuple
from cvnets_tpu.models.detection.base_detection import BaseDetection
from cvnets_tpu.models.detection.utils.rcnn_utils import (
    FastRCNNConvFCHead,
    FastRCNNPredictor,
    MaskRCNNHeads,
    RPNHead,
    balanced_sample_mask,
    decode_boxes,
    encode_boxes,
    match_boxes,
)
from cvnets_tpu.modules.feature_pyramid import FeaturePyramidNetwork
from cvnets_tpu.ops.box_utils import box_iou
from cvnets_tpu.ops.nms import batched_nms, nms
from cvnets_tpu.ops.roi_align import multiscale_roi_align

MAX_GT = 100


def _smooth_l1(x, y, beta=1.0 / 9):
    d = jnp.abs(x - y)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def _fpn_anchors(fm_shapes: List[Tuple[int, int]], strides: List[int],
                 sizes: List[int], ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """Anchors per FPN level in image pixels, concatenated (numpy, trace-time)."""
    all_anchors = []
    for (h, w), stride, size in zip(fm_shapes, strides, sizes):
        ws, hs = [], []
        for r in ratios:
            ws.append(size * math.sqrt(1.0 / r))
            hs.append(size * math.sqrt(r))
        cy, cx = np.meshgrid(
            (np.arange(h) + 0.5) * stride, (np.arange(w) + 0.5) * stride,
            indexing="ij",
        )
        centers = np.stack([cx.ravel(), cy.ravel()], -1)  # (P, 2)
        whs = np.stack([np.asarray(ws), np.asarray(hs)], -1)  # (A, 2)
        p, a = centers.shape[0], whs.shape[0]
        anc = np.concatenate([
            np.repeat(centers, a, 0) - np.tile(whs, (p, 1)) / 2,
            np.repeat(centers, a, 0) + np.tile(whs, (p, 1)) / 2,
        ], -1)
        all_anchors.append(anc.astype(np.float32))
    return np.concatenate(all_anchors, 0)


@MODEL_REGISTRY.register(name="mask_rcnn", type="detection")
class MaskRCNNDetector(BaseDetection):
    opts: Any = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.detection.mask-rcnn.backbone-lr-multiplier",
                           type=float, default=1.0)
        group.add_argument("--model.detection.mask-rcnn.output-strides", type=int,
                           nargs="+", default=[4, 8, 16, 32])
        group.add_argument("--model.detection.mask-rcnn.anchor-sizes", type=int,
                           nargs="+", default=[32, 64, 128, 256])
        group.add_argument("--model.detection.mask-rcnn.fpn-out-channels",
                           type=int, default=256)
        group.add_argument("--model.detection.mask-rcnn.pre-nms-top-n", type=int,
                           default=1000)
        group.add_argument("--model.detection.mask-rcnn.post-nms-top-n", type=int,
                           default=256)
        group.add_argument("--model.detection.mask-rcnn.rpn-fg-iou-thresh",
                           type=float, default=0.7)
        group.add_argument("--model.detection.mask-rcnn.rpn-bg-iou-thresh",
                           type=float, default=0.3)
        group.add_argument("--model.detection.mask-rcnn.box-fg-iou-thresh",
                           type=float, default=0.5)
        group.add_argument("--model.detection.mask-rcnn.box-bg-iou-thresh",
                           type=float, default=0.5)
        group.add_argument("--model.detection.mask-rcnn.rpn-batch-per-image",
                           type=int, default=256)
        group.add_argument("--model.detection.mask-rcnn.box-batch-per-image",
                           type=int, default=128)
        group.add_argument("--model.detection.mask-rcnn.mask-positives", type=int,
                           default=32)
        group.add_argument("--model.detection.mask-rcnn.detections-per-image",
                           type=int, default=100)
        group.add_argument("--model.detection.mask-rcnn.score-threshold",
                           type=float, default=0.05)
        group.add_argument("--model.detection.mask-rcnn.disable-mask-head",
                           action="store_true", default=False)
        group.add_argument("--model.detection.mask-rcnn.disable-fpn",
                           action="store_true", default=False,
                           help="1x1 projections per tap instead of a feature "
                                "pyramid (reference mask_rcnn.py)")
        group.add_argument("--model.detection.mask-rcnn.norm-layer", type=str,
                           default=None,
                           help="norm for RPN/box/mask heads; None = no norm "
                                "(reference rcnn_utils.py:51)")
        return parser

    # config accessors (usable outside apply)
    def _cfg(self, key, default):
        return getattr(self.opts, f"model.detection.mask_rcnn.{key}", default)

    def setup(self) -> None:
        opts = self.opts
        self.encoder = self.build_encoder(opts)
        self.fpn_channels = self._cfg("fpn_out_channels", 256)
        # reference mask_rcnn.py --model.detection.mask-rcnn.disable-fpn: project
        # each backbone tap to fpn_channels with 1x1 convs instead of a pyramid
        self.use_fpn = not self._cfg("disable_fpn", False)
        if self.use_fpn:
            self.fpn = FeaturePyramidNetwork(opts=opts,
                                             out_channels=self.fpn_channels)
        else:
            from cvnets_tpu.layers.conv_layer import ConvLayer2d

            self.proj_layers = [
                ConvLayer2d(opts=opts, out_channels=self.fpn_channels,
                            kernel_size=1, use_norm=True, use_act=False)
                for _ in self._cfg("output_strides", [4, 8, 16, 32])
            ]
        self.rpn_head = RPNHead(opts=opts, in_channels=self.fpn_channels,
                                num_anchors=3)
        self.box_head = FastRCNNConvFCHead(opts=opts,
                                           conv_channels=self.fpn_channels)
        self.box_predictor = FastRCNNPredictor(opts=opts,
                                               n_classes=self.n_detection_classes)
        self.use_mask = not self._cfg("disable_mask_head", False)
        if self.use_mask:
            self.mask_head = MaskRCNNHeads(opts=opts, channels=self.fpn_channels,
                                           n_classes=self.n_detection_classes)

    # ---------------------------------------------------------------- features
    def _fpn_features(self, x: jnp.ndarray, training: bool):
        strides = self._cfg("output_strides", [4, 8, 16, 32])
        end_points = self.encoder.extract_end_points_all(x, use_l5=True,
                                                         training=training)
        taps = {4: "out_l2", 8: "out_l3", 16: "out_l4", 32: "out_l5"}
        fms = [end_points[taps[s]] for s in strides if taps.get(s) in end_points]
        if self.use_fpn:
            fms = self.fpn(fms, training=training)
        else:
            fms = [proj(fm, training=training)
                   for proj, fm in zip(self.proj_layers, fms)]
        return fms, strides[: len(fms)]

    # -------------------------------------------------------------------- RPN
    def _rpn(self, fms, strides, img_hw, training, rng=None, targets=None):
        logits_l, deltas_l = self.rpn_head(fms, training=training)
        fm_shapes = [tuple(f.shape[1:3]) for f in fms]
        sizes = self._cfg("anchor_sizes", [32, 64, 128, 256])[: len(fms)]
        anchors = jnp.asarray(_fpn_anchors(fm_shapes, strides, sizes))  # (A, 4)

        b = fms[0].shape[0]
        obj = jnp.concatenate(
            [l.reshape(b, -1) for l in logits_l], axis=1)  # (B, A)
        deltas = jnp.concatenate(
            [d.reshape(b, -1, 4) for d in deltas_l], axis=1)  # (B, A, 4)

        pre_n = min(self._cfg("pre_nms_top_n", 1000), obj.shape[1])
        post_n = self._cfg("post_nms_top_n", 256)

        def per_image(obj_i, deltas_i):
            scores, idx = jax.lax.top_k(obj_i, pre_n)
            boxes = decode_boxes(deltas_i[idx], anchors[idx])
            boxes = jnp.clip(
                boxes,
                jnp.asarray([0.0, 0.0, 0.0, 0.0]),
                jnp.asarray([img_hw[1], img_hw[0], img_hw[1], img_hw[0]],
                            jnp.float32),
            )
            keep_idx, keep_scores = nms(boxes, scores, iou_threshold=0.7,
                                        max_output=post_n)
            safe = jnp.maximum(keep_idx, 0)
            out_boxes = jnp.where((keep_idx >= 0)[:, None], boxes[safe], 0.0)
            return out_boxes  # (post_n, 4)

        proposals = jax.vmap(per_image)(obj, deltas)  # (B, post_n, 4)
        # detach: the RPN is trained ONLY by its own losses (torchvision
        # semantics); without this the box/mask losses backprop through the
        # RoIAlign box coordinates into the RPN deltas and destabilize them
        proposals = jax.lax.stop_gradient(proposals)

        losses = {}
        if training and targets is not None:
            gt_boxes = targets["box_coordinates"]  # (B, MAX_GT, 4) image pixels
            gt_labels = targets["box_labels"]      # (B, MAX_GT)
            gt_valid = gt_labels > 0

            def rpn_loss_one(obj_i, deltas_i, gtb, gtv, key):
                midx, mlabels = match_boxes(
                    anchors, gtb, gtv,
                    self._cfg("rpn_fg_iou_thresh", 0.7),
                    self._cfg("rpn_bg_iou_thresh", 0.3))
                pos_m, neg_m = balanced_sample_mask(
                    key, mlabels, self._cfg("rpn_batch_per_image", 256), 0.5)
                sel = pos_m | neg_m
                tgt = (mlabels == 1).astype(jnp.float32)
                obj_ls = optax_sigmoid_ce(obj_i, tgt)
                obj_loss = jnp.sum(obj_ls * sel) / jnp.maximum(jnp.sum(sel), 1.0)
                reg_t = encode_boxes(anchors, gtb[midx])
                reg_ls = jnp.sum(_smooth_l1(deltas_i, reg_t), axis=-1)
                reg_loss = jnp.sum(reg_ls * pos_m) / jnp.maximum(jnp.sum(sel), 1.0)
                return obj_loss, reg_loss

            import optax

            def optax_sigmoid_ce(lg, t):
                return optax.sigmoid_binary_cross_entropy(lg, t)

            keys = jax.random.split(
                rng if rng is not None else jax.random.PRNGKey(0), b)
            obj_l, reg_l = jax.vmap(rpn_loss_one)(obj, deltas, gt_boxes,
                                                  gt_valid, keys)
            losses["loss_objectness"] = jnp.mean(obj_l)
            losses["loss_rpn_box_reg"] = jnp.mean(reg_l)
        return proposals, losses

    # -------------------------------------------------------------- RoI heads
    def _roi_heads(self, fms, strides, proposals, img_hw, training,
                   rng=None, targets=None):
        b, n_prop = proposals.shape[:2]
        n_cls = self.n_detection_classes
        losses = {}

        if training and targets is not None:
            gt_boxes = targets["box_coordinates"]
            gt_labels = targets["box_labels"]
            gt_valid = gt_labels > 0
            # append gt to proposals (torchvision behavior)
            proposals = jnp.concatenate([proposals, gt_boxes], axis=1)
            box_batch = self._cfg("box_batch_per_image", 128)
            # candidates = proposals + appended gt; clamp so small
            # post_nms_top_n configs don't crash the fixed-slot top_k
            box_batch = min(box_batch, int(proposals.shape[1]))

            def sample_one(props, gtb, gtl, gtv, key):
                midx, mlab = match_boxes(
                    props, gtb, gtv,
                    self._cfg("box_fg_iou_thresh", 0.5),
                    self._cfg("box_bg_iou_thresh", 0.5))
                pos_m, neg_m = balanced_sample_mask(key, mlab, box_batch, 0.25)
                sel = pos_m | neg_m
                # randomized rank compaction to a fixed box_batch slot set
                rank_key = jax.random.fold_in(key, 7)
                order_score = jnp.where(sel, jax.random.uniform(
                    rank_key, sel.shape), -1.0)
                _scores, take = jax.lax.top_k(order_score, box_batch)
                take_valid = _scores > 0
                t_boxes = props[take]
                t_midx = midx[take]
                t_pos = pos_m[take] & take_valid
                t_labels = jnp.where(t_pos, gtl[t_midx], 0)
                reg_t = encode_boxes(t_boxes, gtb[t_midx],
                                     weights=(10.0, 10.0, 5.0, 5.0))
                return t_boxes, t_labels, reg_t, t_pos, take_valid, t_midx

            keys = jax.random.split(
                rng if rng is not None else jax.random.PRNGKey(1), b)
            (s_boxes, s_labels, s_regt, s_pos, s_valid, s_midx) = jax.vmap(
                sample_one)(proposals, gt_boxes, gt_labels, gt_valid, keys)
        else:
            s_boxes = proposals
            s_labels = s_regt = s_pos = s_valid = s_midx = None

        # box head over all (B * N) rois
        roi_feats = jax.vmap(
            lambda *args: multiscale_roi_align(
                list(args[:-1]), args[-1], strides, output_size=(7, 7)),
        )(*fms, s_boxes)
        bn, np_, oh, ow, c = roi_feats.shape
        flat = roi_feats.reshape(bn * np_, oh, ow, c)
        feats = self.box_head(flat, training=training)
        scores, deltas = self.box_predictor(feats)
        scores = scores.reshape(bn, np_, -1)
        deltas = deltas.reshape(bn, np_, n_cls, 4)

        if training and targets is not None:
            import optax

            ce = optax.softmax_cross_entropy_with_integer_labels(
                scores.astype(jnp.float32), s_labels)
            cls_loss = jnp.sum(ce * s_valid) / jnp.maximum(jnp.sum(s_valid), 1.0)
            sel_deltas = jnp.take_along_axis(
                deltas, s_labels[..., None, None].clip(0)
                .repeat(4, -1), axis=2).squeeze(2)
            reg = jnp.sum(_smooth_l1(sel_deltas.astype(jnp.float32), s_regt),
                          axis=-1)
            reg_loss = jnp.sum(reg * s_pos) / jnp.maximum(jnp.sum(s_pos), 1.0)
            losses["loss_classifier"] = cls_loss
            losses["loss_box_reg"] = reg_loss

            if self.use_mask:
                n_mask = self._cfg("mask_positives", 32)
                gt_masks = targets.get("masks")  # (B, MAX_GT, Hm, Wm) or None

                # NOTE: only PURE functions (roi-align gathers) run under
                # jax.vmap — the flax mask_head (stateful BN) is applied ONCE
                # on the flattened rois outside, otherwise its batch_stats
                # mutation leaks a vmap tracer.
                def gather_mask_rois(boxes_i, pos_i, midx_i, labels_i,
                                     gtm_i, *fms_i):
                    # fixed n_mask positive slots via randomized rank
                    score = jnp.where(pos_i, 1.0, -1.0) \
                        + jax.lax.iota(jnp.float32, boxes_i.shape[0]) * 1e-6
                    _s, take = jax.lax.top_k(score, n_mask)
                    valid = pos_i[take]
                    mb = boxes_i[take]
                    feats_m = multiscale_roi_align(list(fms_i), mb, strides,
                                                   output_size=(14, 14))
                    lab = labels_i[take].clip(0)
                    # gt mask crop: roi-align the full gt mask to 28x28
                    gidx = midx_i[take]
                    gm = gtm_i[gidx].astype(jnp.float32)[..., None]
                    # gt masks may be stored at reduced resolution
                    mask_stride = img_hw[0] / gtm_i.shape[1]
                    tgt = jax.vmap(
                        lambda m, bx: multiscale_roi_align(
                            [m], bx[None], [mask_stride],
                            output_size=(28, 28))[0, ..., 0]
                    )(gm, mb)
                    return feats_m, valid, lab, tgt

                if gt_masks is not None:
                    import optax

                    feats_m, m_valid, m_lab, m_tgt = jax.vmap(gather_mask_rois)(
                        s_boxes, s_pos, s_midx, s_labels, gt_masks, *fms)
                    bm, nm = feats_m.shape[:2]
                    mlogits = self.mask_head(
                        feats_m.reshape((bm * nm,) + feats_m.shape[2:]),
                        training=training)
                    sel = jnp.take_along_axis(
                        mlogits, m_lab.reshape(-1)[:, None, None, None],
                        axis=-1).squeeze(-1)
                    ls = optax.sigmoid_binary_cross_entropy(
                        sel.astype(jnp.float32),
                        (m_tgt.reshape(sel.shape) > 0.5).astype(jnp.float32))
                    per_roi = jnp.mean(ls, axis=(1, 2))
                    valid_f = m_valid.reshape(-1).astype(jnp.float32)
                    losses["loss_mask"] = jnp.sum(per_roi * valid_f) / \
                        jnp.maximum(jnp.sum(valid_f), 1.0)
        return scores, deltas, s_boxes, losses

    # --------------------------------------------------------- detection core
    def _detect_one(self, raw_scores, raw_deltas, proposals, img_hw):
        """Decode + score-filter + class-aware NMS for ONE image (static shapes).
        Returns (labels, scores, boxes) padded to detections_per_image."""
        scores = jax.nn.softmax(raw_scores.astype(jnp.float32), axis=-1)
        boxes = decode_boxes(
            raw_deltas.astype(jnp.float32),
            proposals[:, None, :],
            weights=(10.0, 10.0, 5.0, 5.0),
        )  # (N, C, 4)
        n, c = scores.shape
        fg = scores[:, 1:].reshape(-1)
        fg_boxes = boxes[:, 1:].reshape(-1, 4)
        cls_ids = jnp.tile(jnp.arange(1, c), (n,))
        k = min(self._cfg("detections_per_image", 100) * 4, fg.shape[0])
        top_scores, idx = jax.lax.top_k(fg, k)
        valid = top_scores > self._cfg("score_threshold", 0.05)
        cand_scores = jnp.where(valid, top_scores, -jnp.inf)
        keep_idx, keep_scores = batched_nms(
            fg_boxes[idx], cand_scores, cls_ids[idx], iou_threshold=0.5,
            max_output=self._cfg("detections_per_image", 100))
        safe = jnp.maximum(keep_idx, 0)
        h, w = img_hw
        out_boxes = jnp.clip(
            fg_boxes[idx][safe],
            jnp.asarray([0.0, 0.0, 0.0, 0.0]),
            jnp.asarray([w, h, w, h], jnp.float32))
        out_scores = jnp.where(
            keep_idx >= 0,
            jnp.where(jnp.isfinite(keep_scores), keep_scores, 0.0), 0.0)
        out_labels = jnp.where(keep_idx >= 0, cls_ids[idx][safe], 0)
        return out_labels, out_scores, out_boxes

    # ---------------------------------------------------------------- forward
    def __call__(self, x: jnp.ndarray, targets: Optional[Dict] = None,
                 training: bool = False) -> Dict[str, Any]:
        if isinstance(x, dict):
            targets = targets or x.get("targets")
            x = x["image"]
        img_hw = x.shape[1:3]
        rng = self.make_rng("dropout") if training else None
        fms, strides = self._fpn_features(x, training)
        r1 = jax.random.fold_in(rng, 1) if rng is not None else None
        r2 = jax.random.fold_in(rng, 2) if rng is not None else None
        proposals, rpn_losses = self._rpn(fms, strides, img_hw, training,
                                          rng=r1, targets=targets)
        scores, deltas, used_boxes, head_losses = self._roi_heads(
            fms, strides, proposals, img_hw, training, rng=r2, targets=targets)
        out = {
            "scores": scores, "deltas": deltas, "proposals": used_boxes,
            "image_hw": img_hw,
        }
        if training:
            out["losses"] = {**rpn_losses, **head_losses}
        else:
            # full inference inside the compiled program: decode + NMS + mask head
            # (reference mask_rcnn.py:841-924 returns boxes AND masks)
            det_labels, det_scores, det_boxes = jax.vmap(
                lambda s, d, p: self._detect_one(s, d, p, img_hw)
            )(scores, deltas, used_boxes)
            out["det_labels"] = det_labels
            out["det_scores"] = det_scores
            out["det_boxes"] = det_boxes
            if self.use_mask:
                # vmap only the pure roi-align; apply the (stateful) mask head
                # once on the flattened rois
                feats_m = jax.vmap(
                    lambda boxes_i, *fms_i: multiscale_roi_align(
                        list(fms_i), boxes_i, strides, output_size=(14, 14))
                )(det_boxes, *fms)
                bm, nm = feats_m.shape[:2]
                mlogits = self.mask_head(
                    feats_m.reshape((bm * nm,) + feats_m.shape[2:]),
                    training=False)
                sel = jnp.take_along_axis(
                    mlogits, det_labels.reshape(-1).clip(0)[:, None, None, None],
                    axis=-1).squeeze(-1)
                probs = jax.nn.sigmoid(sel.astype(jnp.float32))
                out["det_masks"] = probs.reshape(
                    (bm, nm) + probs.shape[1:])  # (B, n_det, 28, 28)
        return out

    # ---------------------------------------------------------------- predict
    def postprocess(self, prediction: Dict) -> DetectionPredTuple:
        """Assemble the DetectionPredTuple for image 0 of an eval-mode forward;
        pastes the 28x28 mask probabilities to full image size."""
        masks = None
        if "det_masks" in prediction:
            from cvnets_tpu.ops.mask_paste import paste_masks

            masks = paste_masks(prediction["det_masks"][0],
                                prediction["det_boxes"][0],
                                prediction["image_hw"])
        return DetectionPredTuple(
            labels=prediction["det_labels"][0],
            scores=prediction["det_scores"][0],
            boxes=prediction["det_boxes"][0],
            masks=masks,
        )

    def predict(self, x: jnp.ndarray) -> DetectionPredTuple:
        return self.postprocess(self(x, training=False))

    # ------------------------------------------------------------------ tests
    def dummy_input_and_label(self, batch_size: int) -> Dict[str, Any]:
        im = if_test_env(128, 512)
        rng = np.random.default_rng(0)
        n_gt = 4
        boxes = np.zeros((batch_size, MAX_GT, 4), np.float32)
        labels = np.zeros((batch_size, MAX_GT), np.int64)
        for bi in range(batch_size):
            for gi in range(n_gt):
                x1, y1 = rng.uniform(0, im // 2, 2)
                bw, bh = rng.uniform(8, im // 2, 2)
                boxes[bi, gi] = [x1, y1, min(x1 + bw, im - 1), min(y1 + bh, im - 1)]
                labels[bi, gi] = rng.integers(1, self.n_detection_classes)
        masks = (rng.uniform(size=(batch_size, MAX_GT, im // 4, im // 4))
                 > 0.5).astype(np.float32)
        targets = {
            "box_coordinates": jnp.asarray(boxes),
            "box_labels": jnp.asarray(labels),
            "masks": jnp.asarray(masks),
        }
        # samples carries targets too: the train step applies the model on
        # `samples` only, and Mask R-CNN computes its losses in-forward
        return {
            "samples": {
                "image": jnp.asarray(
                    rng.standard_normal((batch_size, im, im, 3),
                                        dtype=np.float32)),
                "targets": targets,
            },
            "targets": targets,
        }

    def get_lr_multipliers(self, opts):
        mult = self._cfg("backbone_lr_multiplier", 1.0)
        if mult == 1.0:
            return {}
        return {r"encoder": mult}
