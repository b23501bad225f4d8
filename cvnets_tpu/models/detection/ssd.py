"""Single Shot Detector / SSDLite (parity: reference
cvnets/models/detection/ssd.py:29-533; arXiv:1512.02325).

Any classification encoder provides os-16/os-32 taps; extra separable-conv strides
extend to os 64/128/256 and a global-pool map for os=-1; optional FPN; one SSDHead
per stride. Anchors are numpy constants per (h, w, os) — under jit they fold into
the executable. Eval decode + class-offset NMS run fully on device with static
shapes (reference relies on torchvision's C++ batched_nms :480).
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
from cvnets_tpu.layers.conv_layer import ConvLayer2d, SeparableConv2d
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.anchor_generator import build_anchor_generator
from cvnets_tpu.models.detection import DetectionPredTuple
from cvnets_tpu.models.detection.base_detection import BaseDetection
from cvnets_tpu.models.matcher_det import build_matcher
from cvnets_tpu.modules.feature_pyramid import FeaturePyramidNetwork
from cvnets_tpu.modules.ssd_heads import SSDHead
from cvnets_tpu.ops.nms import batched_nms


_ANCHOR_GEN_CACHE = {}
_MATCHER_CACHE = {}


def _anchor_gen_for(opts):
    key = id(opts)
    if key not in _ANCHOR_GEN_CACHE:
        if getattr(opts, "anchor_generator.name", None) is None:
            setattr(opts, "anchor_generator.name", "ssd")
        _ANCHOR_GEN_CACHE[key] = build_anchor_generator(opts)
    return _ANCHOR_GEN_CACHE[key]


def _matcher_for(opts):
    key = id(opts)
    if key not in _MATCHER_CACHE:
        if getattr(opts, "matcher.name", None) is None:
            setattr(opts, "matcher.name", "ssd")
        _MATCHER_CACHE[key] = build_matcher(opts)
    return _MATCHER_CACHE[key]


@MODEL_REGISTRY.register(name="ssd", type="detection")
class SingleShotMaskDetector(BaseDetection):
    opts: Any = None

    coordinates = 4

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.detection.ssd.anchors-aspect-ratio", type=int,
                           nargs="+", action="append", default=None)
        group.add_argument("--model.detection.ssd.output-strides", type=int,
                           nargs="+", default=None)
        group.add_argument("--model.detection.ssd.proj-channels", type=int,
                           nargs="+", default=None)
        group.add_argument("--model.detection.ssd.min-box-size", type=float,
                           default=None)
        group.add_argument("--model.detection.ssd.max-box-size", type=float,
                           default=None)
        group.add_argument("--model.detection.ssd.center-variance", type=float,
                           default=None)
        group.add_argument("--model.detection.ssd.size-variance", type=float,
                           default=None)
        group.add_argument("--model.detection.ssd.iou-threshold", type=float,
                           default=None)
        group.add_argument("--model.detection.ssd.conf-threshold", type=float,
                           default=0.01)
        group.add_argument("--model.detection.ssd.top-k", type=int, default=400)
        group.add_argument("--model.detection.ssd.objects-per-image", type=int,
                           default=200)
        group.add_argument("--model.detection.ssd.nms-iou-threshold", type=float,
                           default=0.5)
        group.add_argument("--model.detection.ssd.fpn-out-channels", type=int,
                           default=256)
        group.add_argument("--model.detection.ssd.use-fpn", action="store_true")
        return parser

    # -- configuration accessors (usable outside init/apply) -----------------
    @property
    def anchor_generator(self):
        return _anchor_gen_for(self.opts)

    @property
    def matcher(self):
        return _matcher_for(self.opts)

    @property
    def output_strides(self):
        return self.anchor_generator.output_strides

    @property
    def conf_threshold(self):
        return getattr(self.opts, "model.detection.ssd.conf_threshold", 0.01)

    @property
    def top_k(self):
        return getattr(self.opts, "model.detection.ssd.top_k", 400)

    @property
    def objects_per_image(self):
        return getattr(self.opts, "model.detection.ssd.objects_per_image", 200)

    @property
    def nms_threshold(self):
        return getattr(self.opts, "model.detection.ssd.nms_iou_threshold", 0.5)

    # ------------------------------------------------------------------ setup
    def setup(self) -> None:
        opts = self.opts
        self.encoder = self.build_encoder(opts)
        output_strides = self.anchor_generator.output_strides
        n_os = len(output_strides)
        proj_channels = list(
            getattr(opts, "model.detection.ssd.proj_channels", None)
            or [512, 256, 256, 128, 128, 64][:n_os])
        # reference ssd.py:84-85: pad with 256 when fewer entries than strides
        proj_channels = proj_channels + [256] * (n_os - len(proj_channels))
        self.proj_channels_list = proj_channels
        use_fpn = getattr(opts, "model.detection.ssd.use_fpn", False)
        anchors_per_os = self.anchor_generator.num_anchors_per_os()

        # extra stride layers beyond the encoder's os-32 (reference ssd.py:86-121):
        # each os>32 is a stride-2 separable conv to proj_channels[idx]; os=-1 is
        # global-pool + 1x1 conv (act, no norm) to proj_channels[idx]
        extra = []
        for idx, os_ in enumerate(output_strides):
            if os_ in (8, 16, 32):
                continue
            if os_ == -1:
                extra.append(ConvLayer2d(
                    opts=opts, out_channels=proj_channels[idx], kernel_size=1,
                    use_norm=False, use_act=True, bias=False,
                ))
            else:
                extra.append(SeparableConv2d(
                    opts=opts, in_channels=-1, out_channels=proj_channels[idx],
                    kernel_size=3, stride=2, use_norm=True, use_act=True,
                ))
        self.extra_layers = extra

        if use_fpn:
            self.fpn = FeaturePyramidNetwork(
                opts=opts,
                out_channels=getattr(opts, "model.detection.ssd.fpn_out_channels",
                                     256),
            )
        else:
            self.fpn = None

        heads = []
        for i, os_ in enumerate(output_strides):
            heads.append(SSDHead(
                opts=opts, n_classes=self.n_detection_classes,
                n_anchors=anchors_per_os[i],
                proj_channels=proj_channels[i],
                kernel_size=3 if os_ != -1 else 1,
            ))
        self.ssd_heads = heads

    # ---------------------------------------------------------------- anchors
    def _anchors_np(self, height: int, width: int) -> np.ndarray:
        anchors = []
        for os_ in self.output_strides:
            if os_ == -1:
                fh = fw = 1
            else:
                fh = int(math.ceil(height / os_))
                fw = int(math.ceil(width / os_))
            anchors.append(self.anchor_generator(fh, fw, os_))
        return np.concatenate(anchors, axis=0)

    # ---------------------------------------------------------------- forward
    def _feature_maps(self, x: jnp.ndarray, training: bool) -> List[jnp.ndarray]:
        end_points = self.encoder.extract_end_points_all(x, use_l5=True,
                                                         training=training)
        fms = []
        extra_i = 0
        prev = None
        for os_ in self.output_strides:
            if os_ == 16:
                fm = end_points["out_l4"]
            elif os_ == 32:
                fm = end_points["out_l5"]
            elif os_ == -1:
                src = prev if prev is not None else end_points["out_l5"]
                pooled = jnp.mean(src, axis=(1, 2), keepdims=True)
                fm = self.extra_layers[extra_i](pooled, training=training)
                extra_i += 1
            else:
                src = prev if prev is not None else end_points["out_l5"]
                fm = self.extra_layers[extra_i](src, training=training)
                extra_i += 1
            fms.append(fm)
            prev = fm
        if self.fpn is not None:
            fms = self.fpn(fms, training=training)
        return fms

    def __call__(self, x: jnp.ndarray, training: bool = False) -> Dict[str, Any]:
        b, h, w, _ = x.shape
        fms = self._feature_maps(x, training)
        boxes_all, scores_all = [], []
        for fm, head in zip(fms, self.ssd_heads):
            boxes, scores = head(fm, training=training)
            boxes_all.append(boxes)
            scores_all.append(scores)
        anchors = jnp.asarray(self._anchors_np(h, w))
        return {
            "scores": jnp.concatenate(scores_all, axis=1),
            "boxes": jnp.concatenate(boxes_all, axis=1),
            "anchors": anchors,
        }

    # ---------------------------------------------------------------- predict
    def postprocess(self, prediction: Dict[str, jnp.ndarray]) -> DetectionPredTuple:
        """Decode + per-class NMS for a single image (device-side, static shapes).
        Parity: reference ssd.py:421-480 postprocess."""
        scores = jax.nn.softmax(prediction["scores"][0].astype(jnp.float32), axis=-1)
        boxes = self.matcher.convert_to_boxes(
            prediction["boxes"][0], prediction["anchors"]
        )
        n_anchors, n_classes = scores.shape
        # drop background (class 0); flatten (anchor, class) pairs
        fg_scores = scores[:, 1:]
        flat_scores = fg_scores.reshape(-1)
        k = min(self.top_k, flat_scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(flat_scores, k)
        anchor_idx = top_idx // (n_classes - 1)
        class_idx = top_idx % (n_classes - 1) + 1
        cand_boxes = boxes[anchor_idx]
        valid = top_scores > self.conf_threshold
        cand_scores = jnp.where(valid, top_scores, -jnp.inf)
        keep_idx, keep_scores = batched_nms(
            cand_boxes, cand_scores, class_idx,
            iou_threshold=self.nms_threshold,
            max_output=min(self.objects_per_image, k),
        )
        safe = jnp.maximum(keep_idx, 0)
        out_boxes = jnp.clip(cand_boxes[safe], 0.0, 1.0)
        out_labels = class_idx[safe]
        out_scores = jnp.where(keep_idx >= 0,
                               jnp.where(jnp.isfinite(keep_scores), keep_scores, 0.0),
                               0.0)
        return DetectionPredTuple(labels=out_labels, scores=out_scores,
                                  boxes=out_boxes)

    def predict(self, x: jnp.ndarray) -> DetectionPredTuple:
        prediction = self(x, training=False)
        return self.postprocess(prediction)

    # ------------------------------------------------------------------ tests
    def dummy_input_and_label(self, batch_size: int) -> Dict[str, Any]:
        im_h = if_test_env(128, 320)
        im_w = if_test_env(128, 320)
        rng = np.random.default_rng(0)
        anchors = self._anchors_np(im_h, im_w)
        n_anchors = anchors.shape[0]
        return {
            "samples": jnp.asarray(
                rng.standard_normal((batch_size, im_h, im_w, 3), dtype=np.float32)),
            "targets": {
                "box_labels": jnp.asarray(
                    rng.integers(0, self.n_detection_classes,
                                 (batch_size, n_anchors))),
                "box_coordinates": jnp.asarray(
                    rng.standard_normal((batch_size, n_anchors, 4)).astype(np.float32)),
            },
        }
