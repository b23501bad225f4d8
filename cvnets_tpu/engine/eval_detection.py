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
    boxes = np.asarray(out.boxes) * np.array([w, h, w, h], np.float32)
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
    for batch in loader:
        samples = batch["samples"]
        for i in range(samples.shape[0]):
            out = run(variables, jnp.asarray(samples[i: i + 1]))
            img_id = int(np.asarray(batch["targets"]["image_id"][i]))
            info = dataset.coco.load_image_info(img_id)
            iw, ih = info.get("width", 1), info.get("height", 1)
            boxes = np.asarray(out.boxes) * np.array([iw, ih, iw, ih], np.float32)
            keep = np.asarray(out.scores) > 0
            detections.append({
                "boxes": boxes[keep],
                "scores": np.asarray(out.scores)[keep],
                "labels": np.asarray(out.labels)[keep],
            })
            gt_boxes, gt_labels, _ = dataset.get_boxes_and_labels(img_id, iw, ih)
            ground_truths.append({"boxes": gt_boxes, "labels": gt_labels})
    res = compute_coco_map(detections, ground_truths)
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
    raise NotImplementedError(f"evaluation.detection.mode={mode} pending")


if __name__ == "__main__":
    import sys

    main_detection_evaluation(sys.argv[1:])
