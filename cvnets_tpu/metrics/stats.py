"""Statistics: drives metric update/log cycles (parity: reference metrics/stats.py:23-222)."""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

from cvnets_tpu.metrics import build_metrics
from cvnets_tpu.metrics.metric_base import AverageMetric
from cvnets_tpu.utils import logger


class Statistics:
    def __init__(self, opts, metric_names, is_master_node: bool = True,
                 is_evaluation: bool = False) -> None:
        self.opts = opts
        self.metrics = build_metrics(opts, metric_names)
        self.is_master_node = is_master_node
        self.is_evaluation = is_evaluation
        self.batch_load_time = 0.0
        self.batch_counter = 0
        self.epoch_start = time.time()

    def reset(self) -> None:
        for m in self.metrics.values():
            m.reset()
        self.batch_load_time = 0.0
        self.batch_counter = 0
        self.epoch_start = time.time()

    def update(self, prediction=None, target=None, extras: Optional[Dict] = None,
               batch_load_time: float = 0.0, batch_size: int = 1,
               precomputed: Optional[Dict[str, Dict]] = None) -> None:
        """Either feed raw (prediction, target, extras) or ``precomputed`` per-metric
        (sum, count) dicts that came out of the jit'd step."""
        for name, metric in self.metrics.items():
            if precomputed is not None and name in precomputed:
                metric.update_values(precomputed[name])
            else:
                metric.update(prediction, target, extras=extras, batch_size=batch_size)
        self.batch_load_time += batch_load_time
        self.batch_counter += 1

    def avg_statistics(self) -> Dict[str, Any]:
        return {name: metric.compute() for name, metric in self.metrics.items()}

    def avg_statistics_all(self) -> Dict[str, float]:
        """Flatten submetrics to 'metric.submetric' keys."""
        flat = {}
        for name, val in self.avg_statistics().items():
            if isinstance(val, dict):
                for k, v in val.items():
                    flat[f"{name}.{k}" if not k.startswith(name) else k] = v
            else:
                flat[name] = val
        return flat

    def metric_value(self, metric_name: str) -> float:
        """Value for checkpoint ranking; supports 'metric.submetric'."""
        parts = metric_name.split(".")
        val = self.metrics[parts[0]].compute()
        if isinstance(val, dict):
            return float(val[parts[1]] if len(parts) > 1 else next(iter(val.values())))
        return float(val)

    def iter_summary(self, epoch: int, n_processed_samples: int, total_samples: int,
                     elapsed_time: float, learning_rate: float) -> None:
        if not self.is_master_node:
            return
        stats = self.avg_statistics_all()
        stats_str = " || ".join(f"{k}: {v:.4f}" for k, v in stats.items())
        speed = n_processed_samples / max(time.time() - elapsed_time, 1e-9)
        logger.log(
            f"Epoch: {epoch:3d} [{n_processed_samples:8d}/{total_samples:8d}] || "
            f"{stats_str} || LR: {learning_rate:.6f} || "
            f"Avg. batch load time: {self.batch_load_time / max(self.batch_counter, 1):.3f} || "
            f"Elapsed time: {time.time() - elapsed_time:.2f}"
        )

    def epoch_summary(self, epoch: int, stage: str = "training") -> None:
        if not self.is_master_node:
            return
        stats = self.avg_statistics_all()
        stats_str = " || ".join(f"{k}: {v:.4f}" for k, v in stats.items())
        logger.log(f"*** {stage.title()} summary for epoch {epoch}: {stats_str}")
