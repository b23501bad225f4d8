"""RangeAugment auxiliary loss (parity: reference loss_fn/neural_augmentation.py:20-210).

Pushes the per-image MSE between input and augmented tensors toward a target MSE
derived from a PSNR curriculum (cosine/linear from e.g. 40dB to 20dB over training).
Traceable: the curriculum target is computed from (epoch|iteration) passed as a
host-side scalar into the step.
"""

from __future__ import annotations

import argparse
import math
from typing import Any

import jax.numpy as jnp

from cvnets_tpu.loss import LOSS_REGISTRY
from cvnets_tpu.utils import logger
from cvnets_tpu.loss.base_criteria import BaseCriteria

MAX_MSE = 65025.0  # mean((255 - 0)^2)


def _psnr_to_mse(psnr: float) -> float:
    return 10.0 ** ((20.0 * math.log10(255.0) - psnr) / 10.0)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)


@LOSS_REGISTRY.register(name="neural_augmentation", type="neural_augmentation")
class NeuralAugmentation(BaseCriteria):
    def __init__(self, opts, *args, **kwargs) -> None:
        super().__init__(opts)
        # yaml values bypass argparse choices — validate here (reference
        # neural_augmentation.py:55,130-136 supports psnr only)
        metric = (getattr(opts, "loss.neural_augmentation.perceptual_metric",
                          "psnr") or "psnr").lower()
        if metric != "psnr":
            logger.error(
                f"Supported perceptual metrics: ['psnr']. Got: {metric}")
        target = getattr(opts, "loss.neural_augmentation.target_value", [40, 20])
        if isinstance(target, (int, float)):
            target = [target, target]
        self.start_mse = _psnr_to_mse(target[0])
        self.end_mse = _psnr_to_mse(target[-1])
        self.curriculum = getattr(
            opts, "loss.neural_augmentation.curriculum_method", "cosine")
        self.alpha = (getattr(opts, "loss.neural_augmentation.alpha", 100.0)
                      or 100.0) / MAX_MSE
        self.iteration_based = getattr(opts, "scheduler.is_iteration_based", False)
        if self.iteration_based:
            self.max_steps = getattr(opts, "scheduler.max_iterations", 10000)
        else:
            self.max_steps = getattr(opts, "scheduler.max_epochs", 100)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--loss.neural-augmentation.perceptual-metric", type=str,
                           default="psnr", choices=["psnr"])
        group.add_argument("--loss.neural-augmentation.target-value", type=float,
                           nargs="+", default=[40, 20])
        group.add_argument("--loss.neural-augmentation.curriculum-method", type=str,
                           default="cosine", choices=["linear", "cosine"])
        group.add_argument("--loss.neural-augmentation.alpha", type=float,
                           default=100.0)
        return parser

    def _target_mse(self, step) -> jnp.ndarray:
        frac = jnp.clip(jnp.asarray(step, jnp.float32) / self.max_steps, 0.0, 1.0)
        if self.curriculum == "cosine":
            w = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        else:
            w = 1.0 - frac
        return self.end_mse + (self.start_mse - self.end_mse) * w

    def __call__(self, input_sample: Any, prediction: Any, target: Any, **kwargs):
        if not isinstance(prediction, dict) or "augmented_tensor" not in prediction \
                or prediction["augmented_tensor"] is None:
            return jnp.asarray(0.0)
        augmented = prediction["augmented_tensor"]
        step = kwargs.get("iterations", 0) if self.iteration_based else kwargs.get(
            "epoch", 0)
        sq_err = ((augmented.astype(jnp.float32)
                   - input_sample.astype(jnp.float32)) * 255.0) ** 2
        pred_mse = jnp.mean(sq_err, axis=tuple(range(1, sq_err.ndim)))
        target_mse = self._target_mse(step)
        return self.alpha * jnp.mean(smooth_l1(pred_mse, target_mse))
