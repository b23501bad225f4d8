"""Detection/segmentation model + loss tests (config-sweep style)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _det_opts():
    from cvnets_tpu.options.opts import get_training_arguments

    opts = get_training_arguments(args=[
        "--model.detection.name", "ssd",
        "--model.detection.n-classes", "7",
        "--model.classification.name", "mobilenetv2",
        "--dataset.category", "detection",
        "--loss.category", "detection",
        "--loss.detection.name", "ssd_multibox_loss",
    ])
    setattr(opts, "anchor_generator.name", "ssd")
    setattr(opts, "anchor_generator.ssd.output_strides", [16, 32, 64, -1])
    setattr(opts, "anchor_generator.ssd.aspect_ratios",
            [[2, 3], [2, 3], [2, 3], [2]])
    setattr(opts, "matcher.name", "ssd")
    setattr(opts, "model.detection.ssd.proj_channels", [256, 128, 128, 64])
    # width 0.25: head wiring/shapes/grad-finiteness are width-independent and
    # the width-1.0 backbone compile dominated the fast tier (VERDICT r3 #8)
    setattr(opts, "model.classification.mobilenetv2.width_multiplier", 0.25)
    return opts


def test_ssd_forward_loss_grad():
    from cvnets_tpu.loss import build_loss_fn
    from cvnets_tpu.models import get_model

    opts = _det_opts()
    model = get_model(opts)
    criteria = build_loss_fn(opts)
    batch = model.dummy_input_and_label(2)

    rng = jax.random.PRNGKey(0)
    # jit the init: one compiled program beats op-by-op eager dispatch
    # (measured 13.1s -> 6.1s on the SSD build under the fast tier's opt-0)
    variables = jax.jit(lambda: model.init(
        {"params": rng, "dropout": rng}, batch["samples"], training=False))()

    # eval-mode head shapes via eval_shape (no second XLA program; the
    # train-mode forward executes for real inside the grad program below)
    out = jax.eval_shape(
        lambda v, x: model.apply(v, x, training=False), variables,
        batch["samples"])
    n_anchors = out["anchors"].shape[0]
    assert out["scores"].shape == (2, n_anchors, 7)
    assert out["boxes"].shape == (2, n_anchors, 4)

    @jax.jit
    def loss_and_grad(params):
        def loss_fn(p):
            v = dict(variables, params=p)
            if "batch_stats" in variables:
                pred, _ = model.apply(v, batch["samples"], training=True,
                                      mutable=["batch_stats"],
                                      rngs={"dropout": rng})
            else:
                pred = model.apply(v, batch["samples"], training=True,
                                   rngs={"dropout": rng})
            loss = criteria(batch["samples"], pred, batch["targets"], training=True)
            return loss["total_loss"] if isinstance(loss, dict) else loss
        return jax.value_and_grad(loss_fn)(params)

    loss, grads = loss_and_grad(variables["params"])
    assert jnp.isfinite(loss)


def test_ssd_matcher_and_decode_roundtrip():
    import argparse

    from cvnets_tpu.models.matcher_det.ssd_matcher import SSDMatcher
    from cvnets_tpu.ops.box_utils import (
        center_to_corner,
        convert_locations_to_boxes,
        corner_to_center,
    )

    opts = argparse.Namespace()
    matcher = SSDMatcher(opts)
    anchors = np.array([[0.25, 0.25, 0.5, 0.5], [0.75, 0.75, 0.5, 0.5]], np.float32)
    gt = np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)
    labels = np.array([3])
    locs, matched_labels = matcher(gt, labels, anchors)
    assert locs.shape == (2, 4) and matched_labels.shape == (2,)
    assert matched_labels[0] == 3  # first anchor overlaps gt
    # decode the matched offsets back: should recover the gt box
    decoded_ctr = convert_locations_to_boxes(locs[:1], anchors[:1])
    decoded = center_to_corner(decoded_ctr)
    np.testing.assert_allclose(decoded[0], gt[0], atol=1e-5)


def test_nms_suppresses_overlaps():
    from cvnets_tpu.ops.nms import batched_nms, nms

    boxes = jnp.asarray([
        [0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    idx, s = nms(boxes, scores, iou_threshold=0.5, max_output=3)
    kept = [int(i) for i in idx if i >= 0]
    assert kept == [0, 2]
    # different classes are not suppressed in batched nms
    classes = jnp.asarray([0, 1, 0])
    idx2, _ = batched_nms(boxes, scores, classes, iou_threshold=0.5, max_output=3)
    kept2 = sorted(int(i) for i in idx2 if i >= 0)
    assert kept2 == [0, 1, 2]


def test_coco_map_perfect_and_miss():
    from cvnets_tpu.metrics.coco_map import compute_coco_map

    gt = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32),
           "labels": np.array([1, 2])}]
    perfect = [{"boxes": gt[0]["boxes"].copy(),
                "scores": np.array([0.9, 0.8]), "labels": np.array([1, 2])}]
    res = compute_coco_map(perfect, gt)
    assert res["bbox"] > 0.99
    miss = [{"boxes": np.array([[100, 100, 110, 110]], np.float32),
             "scores": np.array([0.9]), "labels": np.array([1])}]
    res2 = compute_coco_map(miss, gt)
    assert res2["bbox"] < 0.01


@pytest.mark.parametrize("head", ["deeplabv3", "pspnet"])
def test_segmentation_forward_loss_grad(head):
    from cvnets_tpu.loss import build_loss_fn
    from cvnets_tpu.models import get_model
    from cvnets_tpu.options.opts import get_training_arguments

    opts = get_training_arguments(args=[
        "--model.segmentation.name", "encoder_decoder",
        "--model.segmentation.n-classes", "5",
        "--model.segmentation.seg-head", head,
        "--model.segmentation.use-aux-head",
        "--model.classification.name", "mobilenetv2",
        "--dataset.category", "segmentation",
        "--loss.category", "segmentation",
        "--loss.segmentation.name", "cross_entropy",
    ])
    # head wiring/shapes/grad-finiteness are width-independent (fast tier)
    setattr(opts, "model.classification.mobilenetv2.width_multiplier", 0.25)
    model = get_model(opts)
    criteria = build_loss_fn(opts)
    batch = model.dummy_input_and_label(2)

    rng = jax.random.PRNGKey(0)
    # jit the init: one compiled program beats op-by-op eager dispatch
    # (measured 13.1s -> 6.1s on the SSD build under the fast tier's opt-0)
    variables = jax.jit(lambda: model.init(
        {"params": rng, "dropout": rng}, batch["samples"], training=False))()
    out = jax.eval_shape(
        lambda v, x: model.apply(v, x, training=False), variables,
        batch["samples"])
    assert out.shape == batch["samples"].shape[:3] + (5,)

    @jax.jit
    def loss_and_grad(params):
        def loss_fn(p):
            v = dict(variables, params=p)
            if "batch_stats" in variables:
                pred, _ = model.apply(v, batch["samples"], training=True,
                                      mutable=["batch_stats"],
                                      rngs={"dropout": rng})
            else:
                pred = model.apply(v, batch["samples"], training=True,
                                   rngs={"dropout": rng})
            loss = criteria(batch["samples"], pred, batch["targets"], training=True)
            return loss["total_loss"] if isinstance(loss, dict) else loss
        return jax.value_and_grad(loss_fn)(params)

    loss, grads = loss_and_grad(variables["params"])
    assert jnp.isfinite(loss)


def test_iou_metric_perfect():
    import argparse

    from cvnets_tpu.metrics.intersection_over_union import IoUMetric

    opts = argparse.Namespace()
    setattr(opts, "model.segmentation.n_classes", 3)
    m = IoUMetric(opts=opts)
    target = jnp.asarray(np.random.default_rng(0).integers(0, 3, (2, 8, 8)))
    logits = jax.nn.one_hot(target, 3) * 10.0
    m.update_values(jax.device_get(m.batch_values(logits, target)))
    assert abs(m.compute() - 100.0) < 1e-5


def test_ssd_cropping_invariants():
    """SSDCroping keeps only center-inside boxes, translated into crop frame
    (reference image_pil.py:1016)."""
    import random

    import numpy as np
    from PIL import Image

    from cvnets_tpu.data.transforms.image import SSDCroping
    from cvnets_tpu.options.opts import get_training_arguments

    opts = get_training_arguments(args=[])
    t = SSDCroping(opts)
    random.seed(3)
    for _ in range(20):
        data = {
            "image": Image.new("RGB", (100, 80), (128, 10, 10)),
            "box_coordinates": np.array(
                [[10, 10, 40, 40], [60, 30, 90, 70]], np.float32),
            "box_labels": np.array([1, 2], np.int64),
        }
        out = t(dict(data))
        w, h = out["image"].size
        boxes = np.asarray(out["box_coordinates"])
        assert len(boxes) >= 1
        assert (boxes[:, 0] >= 0).all() and (boxes[:, 1] >= 0).all()
        assert (boxes[:, 2] <= w + 1e-3).all() and (boxes[:, 3] <= h + 1e-3).all()
        assert (boxes[:, 2] > boxes[:, 0]).all()
        assert len(out["box_labels"]) == len(boxes)


def test_photometric_distort_shape_and_range():
    import random

    import numpy as np
    from PIL import Image

    from cvnets_tpu.data.transforms.image import PhotometricDistort
    from cvnets_tpu.options.opts import get_training_arguments

    opts = get_training_arguments(args=[])
    t = PhotometricDistort(opts)
    random.seed(0)
    img = Image.fromarray(
        (np.random.default_rng(0).uniform(0, 255, (40, 50, 3))).astype("uint8"))
    changed = False
    for _ in range(8):
        out = t({"image": img})["image"]
        assert out.size == (50, 40)
        arr = np.asarray(out)
        assert arr.dtype == np.uint8
        changed |= not np.array_equal(arr, np.asarray(img))
    assert changed  # at least one draw actually jittered


def test_imagenet_v2_numeric_folder_remap(tmp_path):
    import numpy as np
    from PIL import Image

    from cvnets_tpu.data.datasets import build_dataset_from_registry
    from cvnets_tpu.options.opts import get_training_arguments

    root = tmp_path / "imagenetv2"
    for cls in ("0", "1", "10"):
        d = root / cls
        d.mkdir(parents=True)
        Image.new("RGB", (36, 36), (int(cls) % 255, 0, 0)).save(d / "a.jpg")
    opts = get_training_arguments(args=[
        "--dataset.name", "imagenet_v2",
        "--dataset.category", "classification",
        "--dataset.root-val", str(root),
    ])
    ds = build_dataset_from_registry(opts, is_training=False)
    labels = sorted(t for _, t in ds.samples)
    assert labels == [0, 1, 10]  # numeric, not lexicographic rank ("10" != 1)


def _make_mini_coco(root, split="train", n=3):
    import json
    import os

    from PIL import Image

    img_dir = os.path.join(root, f"{split}2017")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    images, anns = [], []
    for i in range(n):
        fname = f"{i:012d}.jpg"
        Image.new("RGB", (64, 48), (i * 40 % 255, 80, 10)).save(
            os.path.join(img_dir, fname))
        images.append({"id": i + 1, "file_name": fname,
                       "width": 64, "height": 48})
        anns.append({"id": 10 + i, "image_id": i + 1, "category_id": 7,
                     "bbox": [5, 5, 30, 20], "iscrowd": 0, "area": 600})
        anns.append({"id": 100 + i, "image_id": i + 1, "category_id": 3,
                     "bbox": [30, 20, 20, 20], "iscrowd": 0, "area": 400})
    blob = {"images": images, "annotations": anns,
            "categories": [{"id": 3, "name": "cat"}, {"id": 7, "name": "dog"}]}
    with open(os.path.join(root, "annotations",
                           f"instances_{split}2017.json"), "w") as f:
        json.dump(blob, f)


def test_coco_ssd_dataset_end_to_end(tmp_path):
    """coco_ssd through the real pipeline: stdlib-json index, SSDCroping +
    PhotometricDistort train transforms, host anchor matching — fixed-size
    per-anchor targets out."""
    import numpy as np

    from cvnets_tpu.data.datasets import build_dataset_from_registry
    from cvnets_tpu.options.opts import get_training_arguments

    root = str(tmp_path / "coco")
    _make_mini_coco(root, "train")
    opts = get_training_arguments(args=[
        "--dataset.name", "coco_ssd",
        "--dataset.category", "detection",
        "--dataset.root-train", root,
    ])
    setattr(opts, "anchor_generator.name", "ssd")
    setattr(opts, "anchor_generator.ssd.output_strides", [16, 32, -1])
    setattr(opts, "anchor_generator.ssd.aspect_ratios", [[2], [2], [2]])
    setattr(opts, "matcher.name", "ssd")
    ds = build_dataset_from_registry(opts, is_training=True)
    assert len(ds) == 3
    assert ds.share_dataset_arguments()["model.detection.n_classes"] == 3
    out = ds[(64, 64, 0)]
    assert out["samples"].shape == (64, 64, 3)
    n_anchors = ds.generate_anchors(64, 64).shape[0]
    assert out["targets"]["box_labels"].shape == (n_anchors,)
    assert out["targets"]["box_coordinates"].shape == (n_anchors, 4)
    assert (out["targets"]["box_labels"] > 0).sum() > 0  # something matched
    assert np.isfinite(out["targets"]["box_coordinates"]).all()
