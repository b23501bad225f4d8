"""Offline detection evaluation (parity: reference engine/eval_detection.py:323-407).

Modes: ``single_image`` / ``image_folder`` (save box-rendered outputs) and
``validation_set`` (COCO mAP via the native evaluator). The decode+NMS runs in the
jitted model postprocess; mAP accumulates host-side."""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from cvnets_tpu.utils import logger


def predict_image(opts, model, variables, image_np: np.ndarray):
    """Run detection on a single HWC float image; returns DetectionPredTuple with
    absolute-pixel boxes."""
    import jax
    import jax.numpy as jnp

    h, w = image_np.shape[:2]
    x = jnp.asarray(image_np)[None]

    def run(v, x):
        pred = model.apply(v, x, training=False)
        return model.postprocess(pred)

    out = jax.jit(run)(variables, x)
    boxes = np.asarray(out.boxes)
    if not (boxes.size and boxes.max() > 2.0):
        # normalized [0,1] coords (SSD) -> absolute; Mask R-CNN already emits
        # absolute input-space pixels
        boxes = boxes * np.array([w, h, w, h], np.float32)
    return out._replace(boxes=boxes)


def predict_labeled_dataset(opts, model, variables, loader) -> Dict[str, float]:
    """COCO-mAP over the validation loader (reference :238)."""
    import jax
    import jax.numpy as jnp

    from cvnets_tpu.metrics.coco_map import compute_coco_map

    @jax.jit
    def run(v, x):
        pred = model.apply(v, x, training=False)
        return model.postprocess(pred)

    detections: List[Dict] = []
    ground_truths: List[Dict] = []
    dataset = loader.dataset
    want_segm = "segm" in (getattr(opts, "stats.coco_map.iou_types", ["bbox"])
                           or ["bbox"])
    for batch in loader:
        samples = batch["samples"]
        for i in range(samples.shape[0]):
            x = jnp.asarray(samples[i: i + 1])
            out = run(variables, x)
            img_id = int(np.asarray(batch["targets"]["image_id"][i]))
            info = dataset.coco.load_image_info(img_id)
            iw, ih = info.get("width", 1), info.get("height", 1)
            raw_boxes = np.asarray(out.boxes)
            if raw_boxes.size and raw_boxes.max() > 2.0:
                # absolute network-input coords (Mask R-CNN path): rescale to
                # the original image size
                in_h, in_w = x.shape[1:3]
                boxes = raw_boxes * np.array(
                    [iw / in_w, ih / in_h, iw / in_w, ih / in_h], np.float32)
            else:
                # normalized [0,1] coords (SSD path)
                boxes = raw_boxes * np.array([iw, ih, iw, ih], np.float32)
            keep = np.asarray(out.scores) > 0
            det = {
                "boxes": boxes[keep],
                "scores": np.asarray(out.scores)[keep],
                "labels": np.asarray(out.labels)[keep],
            }
            if want_segm and out.masks is not None:
                from PIL import Image

                masks = np.asarray(out.masks)[keep] > 0.5
                det["masks"] = [
                    np.asarray(Image.fromarray(m.astype(np.uint8)).resize(
                        (iw, ih), Image.NEAREST)) for m in masks
                ]
            detections.append(det)
            gt_boxes, gt_labels, gt_masks = dataset.get_boxes_and_labels(
                img_id, iw, ih, include_masks=want_segm)
            gt = {"boxes": gt_boxes, "labels": gt_labels}
            if want_segm and gt_masks is not None:
                gt["masks"] = gt_masks
            ground_truths.append(gt)
    res = compute_coco_map(detections, ground_truths)
    if want_segm and any("masks" in d for d in detections):
        res.update(compute_coco_map(detections, ground_truths, iou_type="segm"))
    logger.info(f"COCO mAP: {res}")
    return res


def main_detection_evaluation(args=None):
    from cvnets_tpu.data.data_loaders import create_test_loader
    from cvnets_tpu.models import get_model
    from cvnets_tpu.options.opts import get_eval_arguments
    from cvnets_tpu.utils.common_utils import device_setup

    import jax

    opts = get_eval_arguments(args=args)
    opts = device_setup(opts)
    mode = getattr(opts, "evaluation.detection.mode", "validation_set")

    model = get_model(opts)
    rng = jax.random.PRNGKey(0)
    dummy = model.dummy_input_and_label(1)
    variables = model.init({"params": rng, "dropout": rng}, dummy["samples"],
                           training=False)
    pretrained = getattr(opts, "model.detection.pretrained", None)
    if pretrained:
        from cvnets_tpu.utils.checkpoint_utils import load_model_weights

        params, bs = load_model_weights(pretrained, variables["params"],
                                        variables.get("batch_stats"))
        variables = dict(variables, params=params)
        if bs:
            variables["batch_stats"] = bs

    if mode == "validation_set":
        loader = create_test_loader(opts)
        return predict_labeled_dataset(opts, model, variables, loader)
    if mode in ("single_image", "image_folder"):
        # reference eval_detection.py:323-407: render predicted boxes (and
        # instance masks when the model emits them) onto the input image
        from cvnets_tpu.engine.eval_segmentation import (
            _collect_image_paths,
            _eval_size,
            _load_image_f32,
        )

        res_dir = os.path.join(
            getattr(opts, "common.results_loc", "results"), "detections")
        os.makedirs(res_dir, exist_ok=True)
        paths = _collect_image_paths(opts, mode, task="detection")
        size = _eval_size(opts)
        thr = getattr(opts, "model.detection.conf_threshold", 0.3) or 0.3
        for path in paths:
            img = _load_image_f32(path, size)
            out = predict_image(opts, model, variables, img)
            rendered = render_detections(img, out, score_threshold=thr)
            from PIL import Image

            fname = os.path.splitext(os.path.basename(path))[0]
            Image.fromarray(rendered).save(
                os.path.join(res_dir, f"{fname}_boxes.png"))
        logger.info(f"Saved {len(paths)} detection rendering(s) under {res_dir}")
        return res_dir
    raise NotImplementedError(f"evaluation.detection.mode={mode} pending")


def render_detections(image_f32: np.ndarray, out, score_threshold: float = 0.3
                      ) -> np.ndarray:
    """Draw boxes (+ mask overlays for Mask R-CNN outputs) on an HWC float image."""
    from cvnets_tpu.utils.color_map import Colormap
    from cvnets_tpu.utils.visualization_utils import draw_bounding_boxes

    rgb = (np.clip(image_f32, 0, 1) * 255).astype(np.uint8)
    if out.masks is not None:
        cmap = Colormap().get_color_map()
        keep = np.asarray(out.scores) >= score_threshold
        for mask, label in zip(np.asarray(out.masks)[keep],
                               np.asarray(out.labels)[keep]):
            color = np.asarray(cmap[int(label) % len(cmap)], np.float32)
            m = (mask > 0.5)[..., None]
            rgb = np.where(m, (0.5 * rgb + 0.5 * color).astype(np.uint8), rgb)
    return draw_bounding_boxes(
        rgb, np.asarray(out.boxes), np.asarray(out.labels),
        np.asarray(out.scores), score_threshold=score_threshold)


if __name__ == "__main__":
    import sys

    main_detection_evaluation(sys.argv[1:])
