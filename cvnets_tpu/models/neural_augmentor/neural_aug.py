"""RangeAugment neural augmentor (parity: reference
cvnets/neural_augmentor/neural_aug.py:27-300; arXiv:2212.10553).

Learnable brightness/contrast/noise magnitudes applied *inside the model forward* on
device to a random half of the batch (reference :194-216). In JAX these are ordinary
params; the trainer gives them an LR multiplier via the param-group hook.

* basic mode: one learnable scalar magnitude per augmentation.
* distribution mode: learnable (min, max) of a uniform range; the applied magnitude
  is sampled from it per step (reference DistributionNeuralAugmentor :256).
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _clip_fn(x, lo, hi):
    # straight-through clip: keeps gradients alive outside the range
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)


class NeuralAugmentor(nn.Module):
    opts: Any
    mode: str = "distribution"  # "basic" | "distribution"

    @property
    def _enabled(self) -> List[str]:
        out = []
        for name in ("brightness", "contrast", "noise"):
            if getattr(self.opts, f"model.learn_augmentation.{name}", False):
                out.append(name)
        return out

    def _make_params(self, name: str):
        """Create the learnable magnitude params UNCONDITIONALLY so init at
        eval time sees the same tree as the training apply."""
        init = {"brightness": 1.0, "contrast": 1.0, "noise": 0.0}[name]
        if self.mode == "basic":
            return (self.param(f"{name}_mag",
                               lambda _k: jnp.asarray(init, jnp.float32)),)
        lo = self.param(f"{name}_min", lambda _k: jnp.asarray(
            init * 0.5 if name != "noise" else 0.0, jnp.float32))
        hi = self.param(f"{name}_max", lambda _k: jnp.asarray(
            init * 1.5 if name != "noise" else 0.1, jnp.float32))
        return lo, hi

    def _magnitude(self, params, rng) -> jnp.ndarray:
        if self.mode == "basic":
            return params[0]
        lo, hi = params
        u = jax.random.uniform(rng)
        return lo + u * (hi - lo)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        aug_params = {name: self._make_params(name) for name in self._enabled}
        if not training or not self._enabled:
            return x
        rng = self.make_rng("dropout")
        n = x.shape[0]
        y = x
        for i, name in enumerate(self._enabled):
            mag_rng, sel_rng = jax.random.split(jax.random.fold_in(rng, i))
            mag = self._magnitude(aug_params[name], mag_rng)
            if name == "brightness":
                aug = _clip_fn(y * mag, 0.0, 1.0)
            elif name == "contrast":
                mean = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
                aug = _clip_fn((y - mean) * mag + mean, 0.0, 1.0)
            else:  # noise
                noise = jax.random.normal(jax.random.fold_in(mag_rng, 7), y.shape,
                                          y.dtype)
                aug = _clip_fn(y + noise * mag, 0.0, 1.0)
            # apply to a random 50% of the batch (reference :194-216)
            sel = jax.random.bernoulli(sel_rng, 0.5, (n,) + (1,) * (y.ndim - 1))
            y = jnp.where(sel, aug, y)
        return y


def build_neural_augmentor(opts) -> Optional[NeuralAugmentor]:
    mode = getattr(opts, "model.learn_augmentation.mode", None)
    if mode is None:
        return None
    return NeuralAugmentor(opts=opts, mode=mode, name="neural_augmentor")
