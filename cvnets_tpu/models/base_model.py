"""Base class for all registered models (parity: reference cvnets/models/base_model.py).

A linen Module plus the registry/argument contract: ``add_arguments`` classmethod for
CLI harvesting, ``build_model(opts)`` factory, checkpoint-surgery scope flags, and
``dummy_input_and_label`` used by the every-config-builds test strategy (reference
tests/test_model.py).
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class BaseAnyNNModel(nn.Module):
    """All registered models extend this.

    Subclasses must define an ``opts: Any`` dataclass field. Parameters/batch-stats
    live in flax variable collections, not on the module, so "trainable parameters"
    queries are pytree operations handled by cvnets_tpu.optim.
    """

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BaseAnyNNModel:
            return parser
        group = parser.add_argument_group(title="Model arguments (common)")
        group.add_argument(
            "--model.resume-exclude-scopes", type=str, default="",
            help="Comma-separated regex of param scopes to exclude when loading a"
            " finetune checkpoint (reference cvnets/misc/common.py:35)",
        )
        group.add_argument(
            "--model.ignore-missing-scopes", type=str, default="",
            help="Comma-separated regex of param scopes allowed to be missing",
        )
        group.add_argument(
            "--model.rename-scopes-map", type=str, nargs="*", default=None,
            help="Pairs of from:to regex renames applied to checkpoint keys",
        )
        group.add_argument("--model.freeze-modules", type=str, default="",
                           help="Comma-separated module scopes to freeze")
        return parser

    @classmethod
    def build_model(cls, opts, *args, **kwargs) -> "BaseAnyNNModel":
        return cls(opts=opts, *args, **kwargs)

    # -- test/bench helpers ---------------------------------------------------
    def dummy_input_and_label(self, batch_size: int) -> Dict[str, Any]:
        raise NotImplementedError

    # -- param-group hooks (reference get_trainable_parameters) --------------
    def get_lr_multipliers(self, opts) -> Dict[str, float]:
        """Map of param-path regex -> LR multiplier; default none."""
        return {}


def count_parameters(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))


def forward_flops(model, variables, dummy_batch) -> Optional[float]:
    """Forward-pass FLOPs from XLA's cost model (reference prints fvcore MACs at
    startup, base_model.py:182-245). Lowering only — no compile, no execution."""
    try:
        fn = jax.jit(lambda v, x: model.apply(v, x, training=False))
        ca = fn.lower(variables, dummy_batch["samples"]).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops")) if ca else None
    except Exception:
        return None
