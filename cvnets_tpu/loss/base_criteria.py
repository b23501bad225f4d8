"""Base loss criteria (parity: reference loss_fn/base_criteria.py:15-55).

Losses are pure callables: ``loss(input_sample, prediction, target) -> scalar | dict``
where a dict must contain ``total_loss``. They run inside the jit'd train step, so
everything must be traceable (no data-dependent python control flow).
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Union

import jax.numpy as jnp


class BaseCriteria:
    def __init__(self, opts, *args, **kwargs) -> None:
        self.opts = opts

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        return parser

    def __call__(
        self, input_sample: Any, prediction: Any, target: Any, **kwargs
    ) -> Union[jnp.ndarray, Dict[str, jnp.ndarray]]:
        raise NotImplementedError

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}()"

    @staticmethod
    def _class_weights(target: jnp.ndarray, n_classes: int, norm_val: float = 1.1) -> jnp.ndarray:
        """Inverse-frequency class weights (parity: reference
        loss_fn/utils/class_weighting.py:10). Static-shape: histogram over classes."""
        counts = jnp.bincount(target.reshape(-1), length=n_classes)
        total = jnp.sum(counts)
        class_mass = counts / jnp.maximum(total, 1) + norm_val
        return 1.0 / jnp.log(class_mass)
