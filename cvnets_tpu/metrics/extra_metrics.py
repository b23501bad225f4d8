"""Remaining metrics (parity: reference metrics/psnr.py:34,
average_precision.py:21, confusion_mat.py:19, image_text_retrieval.py:21,
retrieval_cmc.py:64, probability_histograms.py:20)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cvnets_tpu.metrics import METRICS_REGISTRY
from cvnets_tpu.metrics.metric_base import AverageMetric, EpochMetric


@METRICS_REGISTRY.register(name="psnr")
class PSNRMetric(AverageMetric):
    def batch_values(self, prediction, target, extras=None) -> Dict[str, Tuple]:
        prediction, target = self._select(prediction, target)
        mse = jnp.mean(
            ((prediction.astype(jnp.float32) - target.astype(jnp.float32))
             * 255.0) ** 2)
        psnr = 20.0 * jnp.log10(255.0) - 10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
        return {"psnr": (psnr, 1.0)}


@METRICS_REGISTRY.register(name="average_precision")
class AveragePrecisionMetric(EpochMetric):
    """Macro AP over classes from accumulated (scores, multi-hot targets)
    (reference wraps sklearn; implemented natively)."""

    def compute_with_aggregates(self, preds: np.ndarray, targets: np.ndarray):
        if targets.ndim == 1:
            n_cls = preds.shape[-1]
            targets = np.eye(n_cls)[targets]
        aps = []
        for c in range(preds.shape[-1]):
            t = targets[:, c]
            if t.sum() == 0:
                continue
            order = np.argsort(-preds[:, c])
            t_sorted = t[order]
            tp = np.cumsum(t_sorted)
            precision = tp / np.arange(1, len(t_sorted) + 1)
            aps.append(float((precision * t_sorted).sum() / t.sum()))
        return float(np.mean(aps) * 100) if aps else 0.0


@METRICS_REGISTRY.register(name="confusion_matrix")
class ConfusionMatrixMetric(EpochMetric):
    def compute_with_aggregates(self, preds: np.ndarray, targets: np.ndarray):
        if preds.ndim > 1:
            preds = preds.argmax(-1)
        n = int(max(preds.max(initial=0), targets.max(initial=0))) + 1
        cm = np.bincount(n * targets.astype(int) + preds.astype(int),
                         minlength=n * n).reshape(n, n)
        return {"accuracy": float(np.diag(cm).sum() / max(cm.sum(), 1) * 100)}


@METRICS_REGISTRY.register(name="image_text_retrieval")
class ImageTextRetrievalMetric(EpochMetric):
    """recall@{1,5,10} both directions from accumulated normalized embeddings
    (reference image_text_retrieval.py:21). update() receives prediction dicts
    with "image"/"text" embeddings; targets are row indices."""

    def reset(self) -> None:
        self._img, self._txt = [], []

    def update(self, prediction, target, extras=None, batch_size: int = 1) -> None:
        if isinstance(prediction, dict) and prediction.get("text") is not None:
            self._img.append(np.asarray(prediction["image"], np.float32))
            self._txt.append(np.asarray(prediction["text"], np.float32))

    def compute(self):
        if not self._img:
            return {"i2t_r1": 0.0}
        img = np.concatenate(self._img)
        txt = np.concatenate(self._txt)
        sim = img @ txt.T
        out = {}
        for name, s in (("i2t", sim), ("t2i", sim.T)):
            ranks = (-s).argsort(axis=1)
            gt = np.arange(s.shape[0])[:, None]
            pos = (ranks == gt).argmax(axis=1)
            for k in (1, 5, 10):
                out[f"{name}_r{k}"] = float((pos < k).mean() * 100)
        return out


@METRICS_REGISTRY.register(name="retrieval_cmc")
class RetrievalCMCMetric(EpochMetric):
    """Cumulative match characteristic for embedding retrieval
    (reference retrieval_cmc.py:64)."""

    def compute_with_aggregates(self, preds: np.ndarray, targets: np.ndarray):
        sim = preds @ preds.T
        np.fill_diagonal(sim, -np.inf)
        nn_idx = sim.argmax(axis=1)
        return float((targets[nn_idx] == targets).mean() * 100)


@METRICS_REGISTRY.register(name="prob_hist")
class ProbabilityHistogramMetric(EpochMetric):
    """Histogram of max and true-class probabilities
    (reference probability_histograms.py:20)."""

    n_bins = 10

    def compute_with_aggregates(self, preds: np.ndarray, targets: np.ndarray):
        probs = preds
        if not np.allclose(probs.sum(-1), 1.0, atol=1e-2):
            e = np.exp(probs - probs.max(-1, keepdims=True))
            probs = e / e.sum(-1, keepdims=True)
        max_hist, _ = np.histogram(probs.max(-1), bins=self.n_bins, range=(0, 1))
        return {
            f"max_bin_{i}": float(v / max(1, len(probs)))
            for i, v in enumerate(max_hist)
        }
