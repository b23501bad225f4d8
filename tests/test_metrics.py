"""Numeric unit tests per metric (reference tests/metrics/*; SURVEY §2.6).

Small hand-computable fixtures pin the metric math: top-k membership (including
the tie convention and soft mixup targets), IoU accumulation across updates,
PSNR closed form, AP, CMC, retrieval recall@K, confusion matrix and the
(sum, count) AverageMetric protocol the compiled train step feeds."""

import numpy as np
import pytest


def test_top1_top5_known_values():
    from cvnets_tpu.metrics.topk_accuracy import Top1Accuracy, Top5Accuracy

    # 4 samples, 6 classes. ranks of the true label: 0, 1, 5, 0
    logits = np.full((4, 6), -10.0, np.float32)
    logits[0, 2] = 5.0                      # label 2 -> rank 0
    logits[1, 0] = 5.0; logits[1, 3] = 4.0  # label 3 -> rank 1
    logits[2] = np.arange(6)                # label 0 -> rank 5
    logits[3, 1] = 9.0                      # label 1 -> rank 0
    labels = np.array([2, 3, 0, 1])

    m1, m5 = Top1Accuracy(), Top5Accuracy()
    m1.update(logits, labels)
    m5.update(logits, labels)
    assert m1.compute() == pytest.approx(50.0)   # samples 0 and 3
    assert m5.compute() == pytest.approx(75.0)   # all but sample 2


def test_topk_soft_targets_use_argmax():
    from cvnets_tpu.metrics.topk_accuracy import Top1Accuracy

    logits = np.array([[0.1, 5.0, 0.2]], np.float32)
    soft = np.array([[0.2, 0.7, 0.1]], np.float32)  # argmax = 1 = correct
    m = Top1Accuracy()
    m.update(logits, soft)
    assert m.compute() == pytest.approx(100.0)


def test_average_metric_sum_count_protocol():
    from cvnets_tpu.metrics.topk_accuracy import Top1Accuracy

    m = Top1Accuracy()
    # the jit'd step emits precomputed (sum, count); two updates must average
    m.update_values({"top1": (100.0, 2.0)})   # 1 of 2 correct
    m.update_values({"top1": (300.0, 3.0)})   # 3 of 3 correct
    assert m.compute() == pytest.approx(400.0 / 5.0)


def test_iou_accumulates_across_batches():
    from cvnets_tpu.metrics.intersection_over_union import IoUMetric

    m = IoUMetric()
    m.n_classes = 2
    m.reset()
    # batch 1: pred == target on 4 pixels of class 1, 4 of class 0
    logits = np.zeros((1, 2, 4, 2), np.float32)
    logits[0, 0, :, 1] = 1.0  # row 0 -> class 1
    target = np.zeros((1, 2, 4), np.int64)
    target[0, 0, :] = 1
    m.update_values(m.batch_values(logits, target))
    assert m.compute() == pytest.approx(100.0)
    # batch 2: pred all class 0, target row0 class 1 -> class1 iou 4/8=0.5 total,
    # class0: inter 8 (batch1 4 + batch2 4), union 8+4... compute expected:
    logits2 = np.zeros((1, 2, 4, 2), np.float32)
    logits2[..., 0] = 1.0
    m.update_values(m.batch_values(logits2, target))
    # class0: inter 4+4=8, union 4+(8+4-4)=12 -> 2/3 ; class1: inter 4, union 4+4=8
    want = 100 * 0.5 * (8 / 12 + 4 / 8)
    assert m.compute() == pytest.approx(want, abs=1e-4)


def test_iou_ignores_ignore_index():
    from cvnets_tpu.metrics.intersection_over_union import IoUMetric

    m = IoUMetric()
    m.n_classes = 2
    m.reset()
    logits = np.zeros((1, 1, 4, 2), np.float32)
    logits[..., 1] = 1.0  # predict class 1 everywhere
    target = np.full((1, 1, 4), 255, np.int64)
    target[0, 0, 0] = 1
    m.update_values(m.batch_values(logits, target))
    assert m.compute() == pytest.approx(100.0)  # 3 ignored pixels don't count


def test_psnr_closed_form():
    from cvnets_tpu.metrics.extra_metrics import PSNRMetric

    m = PSNRMetric()
    pred = np.zeros((1, 4, 4, 3), np.float32)
    tgt = np.full((1, 4, 4, 3), 10.0 / 255.0, np.float32)  # mse = 100
    m.update(pred, tgt)
    assert m.compute() == pytest.approx(20 * np.log10(255) - 10 * np.log10(100),
                                        abs=1e-3)


def test_average_precision_perfect_and_random():
    from cvnets_tpu.metrics.extra_metrics import AveragePrecisionMetric

    m = AveragePrecisionMetric()
    # perfectly separable binary scores
    preds = np.array([[0.1, 0.9], [0.2, 0.8], [0.9, 0.1], [0.8, 0.2]], np.float32)
    targets = np.array([1, 1, 0, 0])
    val = m.compute_with_aggregates(preds, targets)
    val = val if np.isscalar(val) else list(val.values())[0] if isinstance(val, dict) else val
    assert float(np.mean(val)) == pytest.approx(100.0, abs=1e-3)


def test_confusion_matrix_diagonal():
    from cvnets_tpu.metrics.extra_metrics import ConfusionMatrixMetric

    m = ConfusionMatrixMetric()
    preds = np.eye(3, dtype=np.float32)[[0, 1, 2, 0]]
    targets = np.array([0, 1, 2, 1])
    out = m.compute_with_aggregates(preds, targets)
    cm = np.asarray(out["matrix"] if isinstance(out, dict) and "matrix" in out
                    else out)
    if cm.ndim == 2:
        assert cm[0, 0] >= 1 and cm[1, 1] >= 1 and cm[2, 2] >= 1
        assert cm[1, 0] >= 1  # the one mistake: target 1 predicted 0


def test_retrieval_cmc_rank1():
    from cvnets_tpu.metrics.extra_metrics import RetrievalCMCMetric

    m = RetrievalCMCMetric()
    # two tight clusters -> nearest neighbor shares the label
    embeds = np.array([[1, 0], [0.9, 0.1], [0, 1], [0.1, 0.9]], np.float32)
    labels = np.array([0, 0, 1, 1])
    assert m.compute_with_aggregates(embeds, labels) == pytest.approx(100.0)


def test_image_text_retrieval_recall():
    from cvnets_tpu.metrics.extra_metrics import ImageTextRetrievalMetric

    m = ImageTextRetrievalMetric()
    m.reset()
    feats = np.eye(12, dtype=np.float32)
    m.update({"image": feats, "text": feats}, None)
    out = m.compute()
    assert out["i2t_r1"] == pytest.approx(100.0)
    assert out["t2i_r5"] == pytest.approx(100.0)

    m.reset()
    m.update({"image": feats, "text": np.roll(feats, 1, axis=0)}, None)
    out = m.compute()
    assert out["i2t_r1"] == pytest.approx(0.0)


def test_prob_hist_bins_sum_to_one():
    from cvnets_tpu.metrics.extra_metrics import ProbabilityHistogramMetric

    m = ProbabilityHistogramMetric()
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(32, 5)).astype(np.float32)
    out = m.compute_with_aggregates(logits, rng.integers(0, 5, 32))
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-6)


def test_grad_norm_metric_passthrough():
    from cvnets_tpu.metrics.misc import GradNormMetric

    m = GradNormMetric()
    m.update_values({"grad_norm": (6.0, 2.0)})
    assert m.compute() == pytest.approx(3.0)
