"""Exponential moving average of model parameters.

Parity: reference cvnets/misc/averaging_utils.py:14-77 (EMA). On TPU the EMA is a
pytree the same shape as params, updated inside the jit'd train step —
``ema = ema*(1-m) + p*m`` — so it costs one fused elementwise pass with no host sync.
"""

from __future__ import annotations

import argparse
from typing import Any

import jax


def ema_update(ema_params: Any, params: Any, momentum: float) -> Any:
    """One EMA step (reference averaging_utils.py:42-55 semantics)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * (1.0 - momentum) + p.astype(e.dtype) * momentum,
        ema_params,
        params,
    )


def arguments_ema(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="EMA")
    group.add_argument("--ema.enable", action="store_true")
    group.add_argument("--ema.momentum", type=float, default=0.0001)
    group.add_argument("--ema.copy-at-epoch", type=int, default=-1)
    return parser
