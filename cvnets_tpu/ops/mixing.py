"""Batched mixup / cutmix running inside the jit'd train step.

Parity: reference data/transforms/image_torch.py:22-213 (RandomMixup/RandomCutmix) and
``apply_mixing_transforms`` (:416), which the reference Trainer applies after moving
the batch to device. Here they are pure jnp ops — the whole augmentation fuses into
the step's first HBM pass; masks are built from broadcasted iota so shapes stay
static under jit.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def _one_hot(targets: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    if targets.ndim == 2:  # already soft
        return targets
    return jax.nn.one_hot(targets, n_classes, dtype=jnp.float32)


def mixup(rng, samples: jnp.ndarray, targets: jnp.ndarray, n_classes: int,
          alpha: float = 0.2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-level mixup: blend with the batch rolled by one (reference rolls the
    batch rather than a random permutation — image_torch.py:86-99)."""
    lam_rng, _ = jax.random.split(rng)
    lam = jax.random.beta(lam_rng, alpha, alpha)
    soft = _one_hot(targets, n_classes)
    mixed_x = samples * lam + jnp.roll(samples, 1, axis=0) * (1.0 - lam)
    mixed_y = soft * lam + jnp.roll(soft, 1, axis=0) * (1.0 - lam)
    return mixed_x.astype(samples.dtype), mixed_y


def cutmix(rng, samples: jnp.ndarray, targets: jnp.ndarray, n_classes: int,
           alpha: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-level cutmix with a traced box mask (NHWC)."""
    lam_rng, box_rng = jax.random.split(rng)
    lam = jax.random.beta(lam_rng, alpha, alpha)
    n, h, w, _c = samples.shape
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    cy = jax.random.randint(box_rng, (), 0, h)
    cx = jax.random.randint(jax.random.fold_in(box_rng, 1), (), 0, w)
    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    box = ((rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1))[None, :, :, None]
    mixed_x = jnp.where(box, jnp.roll(samples, 1, axis=0), samples)
    # adjust lambda to the realized box area
    lam_adj = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)
    soft = _one_hot(targets, n_classes)
    mixed_y = soft * lam_adj + jnp.roll(soft, 1, axis=0) * (1.0 - lam_adj)
    return mixed_x.astype(samples.dtype), mixed_y


def build_mixing_fn(opts) -> Optional[Callable]:
    """Random choice between enabled mixup/cutmix per batch
    (reference apply_mixing_transforms :416)."""
    mixup_enabled = getattr(opts, "image_augmentation.mixup.enable", False)
    cutmix_enabled = getattr(opts, "image_augmentation.cutmix.enable", False)
    mixup_alpha = getattr(opts, "image_augmentation.mixup.alpha", 0.2)
    cutmix_alpha = getattr(opts, "image_augmentation.cutmix.alpha", 1.0)
    mixup_p = getattr(opts, "image_augmentation.mixup.p", 1.0)
    cutmix_p = getattr(opts, "image_augmentation.cutmix.p", 1.0)
    if not (mixup_enabled or cutmix_enabled):
        return None

    def mixing_fn(rng, samples, targets, n_classes):
        choice_rng, p_rng, op_rng = jax.random.split(rng, 3)
        soft = _one_hot(targets, n_classes)
        branches = []
        if mixup_enabled:
            branches.append(lambda r: mixup(r, samples, targets, n_classes, mixup_alpha))
        if cutmix_enabled:
            branches.append(lambda r: cutmix(r, samples, targets, n_classes, cutmix_alpha))
        if len(branches) == 1:
            mixed_x, mixed_y = branches[0](op_rng)
        else:
            idx = jax.random.randint(choice_rng, (), 0, len(branches))
            mixed_x, mixed_y = jax.lax.switch(idx, branches, op_rng)
        p = mixup_p if mixup_enabled else cutmix_p
        apply = jax.random.uniform(p_rng) < p
        out_x = jnp.where(apply, mixed_x, samples)
        out_y = jnp.where(apply, mixed_y, soft)
        return out_x, out_y

    return mixing_fn


def arguments_mixing(parser):
    group = parser.add_argument_group(title="Mixup/Cutmix arguments")
    group.add_argument("--image-augmentation.mixup.enable", action="store_true",
                       default=False)
    group.add_argument("--image-augmentation.mixup.alpha", type=float, default=0.2)
    group.add_argument("--image-augmentation.mixup.p", type=float, default=1.0)
    group.add_argument("--image-augmentation.cutmix.enable", action="store_true",
                       default=False)
    group.add_argument("--image-augmentation.cutmix.alpha", type=float, default=1.0)
    group.add_argument("--image-augmentation.cutmix.p", type=float, default=1.0)
    return parser
