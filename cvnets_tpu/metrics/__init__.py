"""Metrics registry (parity: reference metrics/__init__.py:10, stats args
options/parse_args.py:10-45)."""

from __future__ import annotations

import argparse

from cvnets_tpu.metrics.metric_base import BaseMetric
from cvnets_tpu.utils.registry import Registry

METRICS_REGISTRY = Registry(
    registry_name="metrics",
    base_class=BaseMetric,
    lazy_load_dirs=["metrics"],
)


def _metric_names(value):
    """stats entries may carry registry key-args, e.g. "top1(pred=logits)"."""
    return value


def arguments_stats(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Statistics arguments")
    group.add_argument("--stats.val", type=str, nargs="+", default=["loss"])
    group.add_argument("--stats.train", type=str, nargs="+", default=["loss"])
    group.add_argument("--stats.checkpoint-metric", type=str, default="loss",
                       help="Metric (optionally metric.submetric) used to rank checkpoints")
    group.add_argument("--stats.checkpoint-metric-max", action="store_true",
                       default=False)
    return parser


def build_metrics(opts, names, is_master_node: bool = True):
    """Instantiate metric objects for the given stats list."""
    out = {}
    for name in names:
        base, _params = METRICS_REGISTRY.parse_key(name)
        out[base] = METRICS_REGISTRY[name](opts=opts)
    return out
