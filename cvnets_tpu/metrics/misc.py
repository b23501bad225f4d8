"""Loss / grad-norm metrics (parity: reference metrics/misc.py:18,61)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from cvnets_tpu.metrics import METRICS_REGISTRY
from cvnets_tpu.metrics.metric_base import AverageMetric


@METRICS_REGISTRY.register(name="loss")
class LossMetric(AverageMetric):
    def batch_values(self, prediction, target, extras=None) -> Dict[str, Tuple]:
        loss = extras.get("loss") if extras else None
        if loss is None:
            return {"loss": (0.0, 1.0)}
        if isinstance(loss, dict):
            return {
                f"loss.{k}" if k != "total_loss" else "loss": (jnp.asarray(v), 1.0)
                for k, v in loss.items()
            }
        return {"loss": (jnp.asarray(loss), 1.0)}


@METRICS_REGISTRY.register(name="grad_norm")
class GradNormMetric(AverageMetric):
    def batch_values(self, prediction, target, extras=None) -> Dict[str, Tuple]:
        gn = extras.get("grad_norm") if extras else None
        if gn is None:
            return {"grad_norm": (0.0, 1.0)}
        return {"grad_norm": (jnp.asarray(gn), 1.0)}
