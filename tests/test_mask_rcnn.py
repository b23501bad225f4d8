"""Mask R-CNN native implementation tests: RoIAlign correctness, forward losses,
grad flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_roi_align_constant_map():
    from cvnets_tpu.ops.roi_align import roi_align

    fm = jnp.ones((16, 16, 4)) * 3.0
    boxes = jnp.asarray([[2.0, 2.0, 10.0, 10.0]])
    out = roi_align(fm, boxes, output_size=(7, 7))
    assert out.shape == (1, 7, 7, 4)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_roi_align_gradient_pattern():
    from cvnets_tpu.ops.roi_align import roi_align

    # linear ramp along x: aligned values should follow the ramp
    x = jnp.arange(16, dtype=jnp.float32)
    fm = jnp.tile(x[None, :, None], (16, 1, 1))
    boxes = jnp.asarray([[4.0, 4.0, 12.0, 12.0]])
    out = roi_align(fm, boxes, output_size=(4, 4), sampling_ratio=1)
    col_means = np.asarray(out[0, :, :, 0]).mean(axis=0)
    assert np.all(np.diff(col_means) > 0)  # monotone in x


def test_rcnn_box_coder_roundtrip():
    from cvnets_tpu.models.detection.utils.rcnn_utils import (
        decode_boxes,
        encode_boxes,
    )

    ref = jnp.asarray([[10.0, 10.0, 50.0, 60.0], [5.0, 5.0, 20.0, 25.0]])
    gt = jnp.asarray([[12.0, 8.0, 55.0, 58.0], [4.0, 7.0, 22.0, 30.0]])
    deltas = encode_boxes(ref, gt)
    back = decode_boxes(deltas, ref)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-3)


def test_match_and_sample_static():
    from cvnets_tpu.models.detection.utils.rcnn_utils import (
        balanced_sample_mask,
        match_boxes,
    )

    anchors = jnp.asarray([
        [0, 0, 10, 10], [20, 20, 30, 30], [100, 100, 110, 110],
        [21, 21, 31, 31],
    ], jnp.float32)
    gt = jnp.asarray([[19, 19, 31, 31]], jnp.float32)
    valid = jnp.asarray([True])
    idx, labels = match_boxes(anchors, gt, valid, 0.7, 0.3)
    assert int(labels[1]) == 1 or int(labels[3]) == 1  # overlapping anchor positive
    assert int(labels[0]) == 0  # far anchor negative
    pos_m, neg_m = balanced_sample_mask(jax.random.PRNGKey(0), labels, 4, 0.5)
    assert not bool(jnp.any(pos_m & neg_m))


@pytest.mark.slow
def test_mask_rcnn_forward_losses_and_grad():
    from cvnets_tpu.models import get_model
    from cvnets_tpu.loss import build_loss_fn
    from cvnets_tpu.options.opts import get_training_arguments

    opts = get_training_arguments(args=[
        "--model.detection.name", "mask_rcnn",
        "--model.detection.n-classes", "5",
        "--model.classification.name", "mobilenetv2",
        "--dataset.category", "detection",
        "--loss.category", "detection",
        "--loss.detection.name", "mask_rcnn_loss",
    ])
    setattr(opts, "model.detection.mask_rcnn.pre_nms_top_n", 64)
    setattr(opts, "model.detection.mask_rcnn.post_nms_top_n", 16)
    setattr(opts, "model.detection.mask_rcnn.box_batch_per_image", 16)
    setattr(opts, "model.detection.mask_rcnn.mask_positives", 4)
    model = get_model(opts)
    criteria = build_loss_fn(opts)
    batch = model.dummy_input_and_label(1)

    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch["samples"],
                           training=True)

    def loss_fn(p):
        v = dict(variables, params=p)
        if "batch_stats" in variables:
            pred, _ = model.apply(v, batch["samples"], training=True,
                                  mutable=["batch_stats"], rngs={"dropout": rng})
        else:
            pred = model.apply(v, batch["samples"], training=True,
                               rngs={"dropout": rng})
        loss = criteria(batch["samples"], pred, batch["targets"], training=True)
        return loss["total_loss"] if isinstance(loss, dict) else loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert jnp.isfinite(loss)
    # RPN head must receive gradient
    gn = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(
        grads.get("rpn_head", {}))))
    assert float(gn) > 0
