"""Top-k accuracy (parity: reference metrics/topk_accuracy.py:33)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from cvnets_tpu.metrics import METRICS_REGISTRY
from cvnets_tpu.metrics.metric_base import AverageMetric


def top_k_correct(logits: jnp.ndarray, target: jnp.ndarray, k: int) -> jnp.ndarray:
    """Number of samples whose true label is within the top-k logits; traceable.

    Handles soft targets (mixup) by arg-maxing the target distribution, matching the
    reference's Tensor/Dict handling.
    """
    if target.ndim == logits.ndim:
        target = jnp.argmax(target, axis=-1)
    k = min(k, logits.shape[-1])
    # top-k membership without a full sort: count logits strictly greater than the
    # target logit; correct if fewer than k
    tgt_logit = jnp.take_along_axis(logits, target[..., None], axis=-1)
    rank = jnp.sum(logits > tgt_logit, axis=-1)
    return jnp.sum((rank < k).astype(jnp.float32))


class _TopK(AverageMetric):
    k: int = 1

    def batch_values(self, prediction, target, extras=None) -> Dict[str, Tuple]:
        prediction, target = self._select(prediction, target)
        if isinstance(prediction, dict):
            prediction = prediction.get("logits", next(iter(prediction.values())))
        n = prediction.shape[0]
        correct = top_k_correct(prediction, target, self.k)
        return {f"top{self.k}": (correct * 100.0, float(n))}


@METRICS_REGISTRY.register(name="top1")
class Top1Accuracy(_TopK):
    k = 1


@METRICS_REGISTRY.register(name="top5")
class Top5Accuracy(_TopK):
    k = 5
