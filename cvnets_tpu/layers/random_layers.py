"""Stochastic regularization layers (parity: reference cvnets/layers/stochastic_depth.py,
random_layers.py)."""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class StochasticDepth(nn.Module):
    """Row-wise stochastic depth (drop-path). Scales surviving rows by 1/keep_prob.

    Parity: reference cvnets/layers/stochastic_depth.py (torchvision semantics,
    mode="row").
    """

    p: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        if not training or self.p <= 0.0:
            return x
        keep = 1.0 - self.p
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class RandomApply(nn.Module):
    """Apply a sub-module with probability p per batch element during training
    (parity: reference random_layers.py RandomApplyLayer)."""

    layer: Any
    p: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        y = self.layer(x)
        if not training:
            return y
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, self.p, shape)
        return jnp.where(mask, y, x)
