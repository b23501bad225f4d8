"""Metric base classes (parity: reference metrics/metric_base.py:23-244).

Two aggregation strategies, as in the reference:

* ``AverageMetric`` — running (sum, count) of per-batch device scalars. Under GSPMD
  the jit'd step already sees the *global* batch, so the reference's per-update
  cross-rank all-reduce disappears; host accumulation is enough.
* ``EpochMetric`` — accumulates per-batch predictions host-side and computes at epoch
  end (reference gathers objects across ranks; here the evaluator feeds fully-gathered
  arrays).

Metrics expose ``batch_values(prediction, target, extras) -> dict[str, (sum, count)]``
which is traceable, so it can run inside the jit'd step.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np


class BaseMetric:
    pred_key: Optional[str] = None  # set via registry key-args, e.g. top1(pred=logits)
    target_key: Optional[str] = None

    def __init__(self, opts=None, pred: Optional[str] = None,
                 target: Optional[str] = None, **kwargs) -> None:
        self.opts = opts
        self.pred_key = pred
        self.target_key = target
        self.reset()

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        return parser

    def _select(self, prediction, target):
        if self.pred_key and isinstance(prediction, dict):
            prediction = prediction[self.pred_key]
        if self.target_key and isinstance(target, dict):
            target = target[self.target_key]
        return prediction, target

    def reset(self) -> None:
        raise NotImplementedError

    def update(self, prediction, target, extras=None, batch_size: int = 1) -> None:
        raise NotImplementedError

    def compute(self) -> Union[float, Dict[str, float]]:
        raise NotImplementedError


class AverageMetric(BaseMetric):
    def reset(self) -> None:
        self._sums: Dict[str, float] = {}
        self._counts: Dict[str, float] = {}

    def batch_values(self, prediction, target, extras=None) -> Dict[str, Tuple]:
        """Return {name: (value_sum, count)}; traceable."""
        raise NotImplementedError

    def update(self, prediction, target, extras=None, batch_size: int = 1) -> None:
        for name, (vsum, cnt) in self.batch_values(prediction, target, extras).items():
            self._sums[name] = self._sums.get(name, 0.0) + float(vsum)
            self._counts[name] = self._counts.get(name, 0.0) + float(cnt)

    def update_values(self, values: Dict[str, Tuple]) -> None:
        """Accumulate pre-computed (sum, count) pairs coming out of the jit step."""
        for name, (vsum, cnt) in values.items():
            self._sums[name] = self._sums.get(name, 0.0) + float(vsum)
            self._counts[name] = self._counts.get(name, 0.0) + float(cnt)

    def compute(self) -> Union[float, Dict[str, float]]:
        out = {
            name: (self._sums[name] / self._counts[name]) if self._counts[name] else 0.0
            for name in self._sums
        }
        if len(out) == 1:
            return next(iter(out.values()))
        return out


class EpochMetric(BaseMetric):
    def reset(self) -> None:
        self._preds = []
        self._targets = []

    def update(self, prediction, target, extras=None, batch_size: int = 1) -> None:
        # np.asarray on a batch-sharded jax Array is PROCESS-LOCAL on a
        # multi-host pod — every host would silently compute the metric on its
        # shard only. Gather to fully-replicated arrays first.
        import jax

        if jax.process_count() > 1:
            def gather(x):
                if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
                    from jax.experimental import multihost_utils

                    return multihost_utils.process_allgather(x, tiled=True)
                return x

            prediction = jax.tree_util.tree_map(gather, prediction)
            target = jax.tree_util.tree_map(gather, target)
        prediction, target = self._select(prediction, target)
        self._preds.append(np.asarray(prediction))
        self._targets.append(np.asarray(target))

    def compute_with_aggregates(self, preds: np.ndarray, targets: np.ndarray):
        raise NotImplementedError

    def compute(self) -> Union[float, Dict[str, float]]:
        if not self._preds:
            return 0.0
        preds = np.concatenate(self._preds, axis=0)
        targets = np.concatenate(self._targets, axis=0)
        return self.compute_with_aggregates(preds, targets)
