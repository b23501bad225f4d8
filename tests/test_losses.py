"""Numeric unit tests per loss family (reference tests/loss_fns/*; SURVEY §2.4).

Each loss is checked against a closed-form value computed with plain numpy, so a
silent formula regression (smoothing blend, ignore-index masking, temperature
scaling, hard-negative ratio) fails loudly instead of only moving top-1.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _opts(**kv):
    ns = argparse.Namespace()
    for k, v in kv.items():
        setattr(ns, k, v)
    return ns


def _np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _np_ce(logits, labels):
    p = _np_softmax(logits)
    return -np.log(p[np.arange(len(labels)), labels])


# ------------------------------------------------------------- classification
def test_cross_entropy_matches_manual():
    from cvnets_tpu.loss.classification import CrossEntropy

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(8,))
    loss = CrossEntropy(_opts())
    got = float(loss(None, jnp.asarray(logits), jnp.asarray(labels)))
    want = _np_ce(logits, labels).mean()
    assert abs(got - want) < 1e-5


def test_cross_entropy_label_smoothing_blend():
    from cvnets_tpu.loss.classification import CrossEntropy

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(4, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=(4,))
    eps = 0.1
    opts = _opts(**{"loss.classification.cross_entropy.label_smoothing": eps})
    got = float(CrossEntropy(opts)(None, jnp.asarray(logits),
                                   jnp.asarray(labels), training=True))
    # blend of hard CE and uniform CE (reference formulation)
    hard = _np_ce(logits, labels)
    logp = np.log(_np_softmax(logits))
    uniform = -(logp.mean(axis=-1))
    want = ((1 - eps) * hard + eps * uniform).mean()
    assert abs(got - want) < 1e-5
    # smoothing is train-only (reference eval path)
    got_eval = float(CrossEntropy(opts)(None, jnp.asarray(logits),
                                        jnp.asarray(labels), training=False))
    assert abs(got_eval - hard.mean()) < 1e-5


def test_cross_entropy_soft_targets_mixup_path():
    from cvnets_tpu.loss.classification import CrossEntropy

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(4, 6)).astype(np.float32)
    soft = rng.dirichlet(np.ones(6), size=4).astype(np.float32)
    got = float(CrossEntropy(_opts())(None, jnp.asarray(logits), jnp.asarray(soft)))
    want = (-(soft * np.log(_np_softmax(logits))).sum(-1)).mean()
    assert abs(got - want) < 1e-5


def test_binary_cross_entropy_matches_manual():
    from cvnets_tpu.loss.classification import BinaryCrossEntropy

    rng = np.random.default_rng(3)
    logits = rng.normal(size=(8, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=(8,))
    got = float(BinaryCrossEntropy(_opts())(None, jnp.asarray(logits),
                                            jnp.asarray(labels)))
    onehot = np.eye(4)[labels]
    p = 1 / (1 + np.exp(-logits))
    bce = -(onehot * np.log(p) + (1 - onehot) * np.log1p(-p))
    # reference 'mean' = torch BCE mean over ALL elements
    # (binary_cross_entropy.py:80-86)
    assert abs(got - bce.mean()) < 1e-4

    opts = _opts()
    setattr(opts, "loss.classification.binary_cross_entropy.reduction",
            "batch_mean")
    got_bm = float(BinaryCrossEntropy(opts)(None, jnp.asarray(logits),
                                            jnp.asarray(labels)))
    assert abs(got_bm - bce.sum() / 8) < 1e-3
    setattr(opts, "loss.classification.binary_cross_entropy.reduction", "sum")
    got_sum = float(BinaryCrossEntropy(opts)(None, jnp.asarray(logits),
                                             jnp.asarray(labels)))
    assert abs(got_sum - bce.sum()) < 1e-2


# --------------------------------------------------------------- segmentation
def test_seg_cross_entropy_ignore_index_and_aux():
    from cvnets_tpu.loss.segmentation import SegCrossEntropy

    rng = np.random.default_rng(4)
    logits = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    target = rng.integers(0, 3, size=(2, 4, 4))
    target[0, 0, :] = 255  # ignored row
    loss = SegCrossEntropy(_opts())
    got = float(loss(None, jnp.asarray(logits), jnp.asarray(target)))
    valid = target != 255
    flat_ce = _np_ce(logits.reshape(-1, 3), np.where(valid, target, 0).reshape(-1))
    want = (flat_ce * valid.reshape(-1)).sum() / valid.sum()
    assert abs(got - want) < 1e-5

    aux = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    out = loss(None, {"segmentation_output": jnp.asarray(logits),
                      "aux_output": jnp.asarray(aux)}, jnp.asarray(target))
    assert set(out) == {"total_loss", "seg_loss", "aux_loss"}
    assert abs(float(out["total_loss"])
               - (float(out["seg_loss"]) + 0.4 * float(out["aux_loss"]))) < 1e-6


@pytest.mark.parametrize("smoothing,class_wts", [(0.0, False), (0.1, False),
                                                 (0.0, True), (0.1, True)])
def test_seg_ce_fused_matches_upsampled(smoothing, class_wts):
    """The fused tiled resize+CE (ops/seg_ce.py) must equal
    CE(bilinear_resize(logits)) in value AND gradient — it is the train-time
    replacement for the reference's upsample-then-CE
    (loss_fn/segmentation/cross_entropy.py:19 after base_seg_head upsampling)."""
    from cvnets_tpu.loss.segmentation import SegCrossEntropy

    rng = np.random.default_rng(7)
    # deliberately non-square, non-divisible head/label resolutions
    logits = rng.normal(size=(2, 9, 13, 7)).astype(np.float32)
    target = rng.integers(0, 7, size=(2, 48, 52)).astype(np.int32)
    target[0, :5, :] = 255
    target[1, :, -3:] = 255

    opts = _opts(**{
        "loss.segmentation.cross_entropy.label_smoothing": smoothing,
        "loss.segmentation.cross_entropy.class_weights": class_wts,
    })
    loss = SegCrossEntropy(opts)
    tgt = jnp.asarray(target)

    def naive(lo):
        up = jax.image.resize(lo, (2, 48, 52, 7), method="bilinear")
        return loss(None, up, tgt)

    def fused(lo):
        return loss(None, lo, tgt)  # shape mismatch -> fused branch

    lo = jnp.asarray(logits)
    v_naive, g_naive = jax.value_and_grad(naive)(lo)
    v_fused, g_fused = jax.value_and_grad(fused)(lo)
    assert abs(float(v_naive) - float(v_fused)) < 2e-5
    np.testing.assert_allclose(np.asarray(g_naive), np.asarray(g_fused),
                               rtol=2e-4, atol=2e-6)


def test_seg_ce_fused_aux_dict_and_enc_dec_train_forward():
    """End-to-end: enc_dec returns head-res logits in training (the fused
    path), full-res in eval; the aux-head dict goes through the fused CE."""
    from cvnets_tpu.loss.segmentation import SegCrossEntropy

    rng = np.random.default_rng(8)
    main = jnp.asarray(rng.normal(size=(2, 8, 8, 5)).astype(np.float32))
    aux = jnp.asarray(rng.normal(size=(2, 4, 4, 5)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, 5, size=(2, 32, 32)).astype(np.int32))
    loss = SegCrossEntropy(_opts())
    out = loss(None, {"segmentation_output": main, "aux_output": aux}, target)
    up = {
        "segmentation_output": jax.image.resize(
            main, (2, 32, 32, 5), method="bilinear"),
        "aux_output": jax.image.resize(aux, (2, 32, 32, 5), method="bilinear"),
    }
    want = loss(None, up, target)
    assert abs(float(out["total_loss"]) - float(want["total_loss"])) < 2e-5


# ----------------------------------------------------------------- multimodal
def test_contrastive_clip_aligned_vs_shuffled():
    from cvnets_tpu.loss.multi_modal import ContrastiveLossClip

    loss = ContrastiveLossClip(_opts())
    feats = np.eye(8, 16, dtype=np.float32)  # orthonormal
    pred = {"image": jnp.asarray(feats), "text": jnp.asarray(feats),
            "logit_scale": 100.0}
    aligned = float(loss(None, pred, None, training=True)["total_loss"])
    assert aligned < 1e-3  # perfectly aligned pairs -> ~0

    perm = np.roll(feats, 1, axis=0)
    shuffled = float(loss(None, {"image": jnp.asarray(feats),
                                 "text": jnp.asarray(perm),
                                 "logit_scale": 100.0}, None,
                          training=True)["total_loss"])
    assert shuffled > aligned + 1.0
    # reference returns 0 at val (contrastive_loss_clip.py:131)
    assert float(loss(None, pred, None, training=False)) == 0.0


# --------------------------------------------------------------- distillation
def _stub_distill(cls, teacher_logits, **attrs):
    obj = cls.__new__(cls)
    obj._teacher_logits = lambda x: jnp.asarray(teacher_logits)
    for k, v in attrs.items():
        setattr(obj, k, v)
    return obj


def test_soft_kl_zero_when_student_equals_teacher():
    from cvnets_tpu.loss.distillation import SoftKLLoss

    rng = np.random.default_rng(5)
    logits = rng.normal(size=(4, 7)).astype(np.float32)
    loss = _stub_distill(SoftKLLoss, logits, temperature=2.0)
    assert abs(float(loss(None, jnp.asarray(logits), None))) < 1e-6


def test_soft_kl_matches_manual_kl_times_t2():
    from cvnets_tpu.loss.distillation import SoftKLLoss

    rng = np.random.default_rng(6)
    student = rng.normal(size=(4, 7)).astype(np.float32)
    teacher = rng.normal(size=(4, 7)).astype(np.float32)
    t = 3.0
    loss = _stub_distill(SoftKLLoss, teacher, temperature=t)
    got = float(loss(None, jnp.asarray(student), None))
    q = _np_softmax(teacher / t)
    logp = np.log(_np_softmax(student / t))
    want = (q * (np.log(q) - logp)).sum(-1).mean() * t * t
    assert abs(got - want) < 1e-4


def test_hard_distillation_is_ce_against_teacher_argmax():
    from cvnets_tpu.loss.distillation import HardDistillationLoss

    rng = np.random.default_rng(7)
    student = rng.normal(size=(4, 7)).astype(np.float32)
    teacher = rng.normal(size=(4, 7)).astype(np.float32)
    loss = _stub_distill(HardDistillationLoss, teacher)
    got = float(loss(None, jnp.asarray(student), None))
    want = _np_ce(student, teacher.argmax(-1)).mean()
    assert abs(got - want) < 1e-5


# ---------------------------------------------------------- neural augmentation
def test_neural_augmentation_curriculum_endpoints():
    from cvnets_tpu.loss.neural_augmentation import NeuralAugmentation, _psnr_to_mse

    opts = _opts(**{
        "loss.neural_augmentation.target_value": [40, 20],
        "loss.neural_augmentation.curriculum_method": "linear",
        "scheduler.is_iteration_based": False,
        "scheduler.max_epochs": 100,
    })
    loss = NeuralAugmentation(opts)
    assert abs(loss.start_mse - _psnr_to_mse(40)) < 1e-9
    assert abs(loss.end_mse - _psnr_to_mse(20)) < 1e-9
    # 20 dB PSNR target allows 100x the MSE of 40 dB — the curriculum loosens
    assert loss.end_mse > loss.start_mse * 99


# ------------------------------------------------------------------- composite
def test_composite_loss_weighted_sum():
    from cvnets_tpu.loss.composite_loss import CompositeLoss

    opts = _opts(**{
        "loss.composite_loss": [
            {"loss_category": "classification", "loss_weight": 1.0,
             "classification": {"name": "cross_entropy",
                                "cross_entropy": {"label_smoothing": 0.0}}},
            {"loss_category": "neural_augmentation", "loss_weight": 0.5,
             "neural_augmentation": {"perceptual_metric": "psnr",
                                     "target_value": [40, 20],
                                     "curriculum_method": "cosine"}},
        ],
        "scheduler.is_iteration_based": False,
        "scheduler.max_epochs": 100,
    })
    loss = CompositeLoss(opts)
    rng = np.random.default_rng(8)
    logits = rng.normal(size=(4, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(4,))
    x = jnp.asarray(rng.uniform(0, 1, size=(4, 8, 8, 3)).astype(np.float32))
    aug = x + 0.05 * jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    pred = {"logits": jnp.asarray(logits), "augmented_tensor": aug}
    out = loss(x, pred, jnp.asarray(labels), training=True, epoch=0, iterations=0)
    assert float(out["neural_augmentation"]) > 0.0
    assert abs(float(out["total_loss"])
               - (1.0 * float(out["classification"])
                  + 0.5 * float(out["neural_augmentation"]))) < 1e-5


# ------------------------------------------------------------------ detection
def test_ssd_multibox_mining_and_regression():
    """Hard-negative mining keeps at most neg_pos_ratio * num_pos negatives, and
    the smooth-L1 regression term only counts positive anchors."""
    from cvnets_tpu.loss.detection import SSDLoss

    opts = _opts(**{"loss.detection.ssd_multibox_loss.neg_pos_ratio": 3})
    loss = SSDLoss(opts)
    rng = np.random.default_rng(9)
    n_anchors, n_cls = 16, 4
    scores = rng.normal(size=(1, n_anchors, n_cls)).astype(np.float32)
    gt_labels = np.zeros((1, n_anchors), np.int64)
    gt_labels[0, :2] = 1  # 2 positives -> up to 6 mined negatives
    gt_boxes = rng.normal(size=(1, n_anchors, 4)).astype(np.float32)

    # perfect localization: regression term vanishes
    out_perfect = float(loss(None, {"scores": jnp.asarray(scores),
                                    "boxes": jnp.asarray(gt_boxes)},
                             {"box_labels": jnp.asarray(gt_labels),
                              "box_coordinates": jnp.asarray(gt_boxes)}))

    # manual: CE over positives + top-6 hardest negatives, / num_pos
    logp = np.log(_np_softmax(scores[0]))
    neg_loss = -logp[:, 0]
    neg_loss[:2] = -np.inf
    hard_negs = np.argsort(-neg_loss)[:6]
    keep = np.zeros(n_anchors, bool)
    keep[:2] = True
    keep[hard_negs] = True
    ce = _np_ce(scores[0], gt_labels[0])
    want = (ce * keep).sum() / 2.0
    assert abs(out_perfect - want) < 1e-4

    # offset boxes: loss increases by exactly the positive-anchor smooth-L1
    bad_boxes = gt_boxes.copy()
    bad_boxes[0, :, :] += 2.0  # |diff|=2 -> smooth_l1 = 1.5 per coord
    out_bad = float(loss(None, {"scores": jnp.asarray(scores),
                                "boxes": jnp.asarray(bad_boxes)},
                         {"box_labels": jnp.asarray(gt_labels),
                          "box_coordinates": jnp.asarray(gt_boxes)}))
    # only the 2 positive anchors contribute: 2 anchors * 4 coords * 1.5 / 2 pos
    assert abs((out_bad - out_perfect) - (2 * 4 * 1.5) / 2.0) < 1e-4
