"""mIoU metric (parity: reference metrics/intersection_over_union.py:57).

Accumulates per-class intersection/union sums on device ((sum, count) protocol), so
the jit'd eval step emits one small vector per batch."""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from cvnets_tpu.metrics import METRICS_REGISTRY
from cvnets_tpu.metrics.metric_base import AverageMetric


@METRICS_REGISTRY.register(name="iou")
class IoUMetric(AverageMetric):
    def __init__(self, opts=None, **kwargs) -> None:
        self.n_classes = getattr(opts, "model.segmentation.n_classes", 21) if opts else 21
        self.ignore_idx = getattr(
            opts, "loss.segmentation.cross_entropy.ignore_index", 255) if opts else 255
        super().__init__(opts, **kwargs)

    def reset(self) -> None:
        super().reset()
        import numpy as np

        self._inter = np.zeros(self.n_classes, np.float64)
        self._union = np.zeros(self.n_classes, np.float64)

    def batch_values(self, prediction, target, extras=None) -> Dict[str, Tuple]:
        logits = prediction
        if isinstance(prediction, dict):
            logits = prediction.get("segmentation_output",
                                    next(iter(prediction.values())))
        pred = jnp.argmax(logits, axis=-1)
        valid = target != self.ignore_idx
        safe_t = jnp.where(valid, target, 0)
        one_hot_p = jnp.eye(self.n_classes)[pred] * valid[..., None]
        one_hot_t = jnp.eye(self.n_classes)[safe_t] * valid[..., None]
        inter = jnp.sum(one_hot_p * one_hot_t, axis=tuple(range(one_hot_p.ndim - 1)))
        union = (jnp.sum(one_hot_p, axis=tuple(range(one_hot_p.ndim - 1)))
                 + jnp.sum(one_hot_t, axis=tuple(range(one_hot_t.ndim - 1))) - inter)
        return {"__iou_vectors__": ((inter, union), 1.0)}

    def update_values(self, values: Dict[str, Tuple]) -> None:
        import numpy as np

        (inter, union), _ = values["__iou_vectors__"]
        self._inter += np.asarray(inter, np.float64)
        self._union += np.asarray(union, np.float64)

    def compute(self):
        import numpy as np

        present = self._union > 0
        if not present.any():
            return 0.0
        iou = self._inter[present] / self._union[present]
        return float(np.mean(iou) * 100.0)
