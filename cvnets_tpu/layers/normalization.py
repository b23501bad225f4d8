"""Normalization layer factory (parity: reference cvnets/layers/normalization/*).

TPU notes:
* BatchNorm momentum convention differs: torch's ``momentum=0.1`` (fraction of the new
  batch statistic) equals flax's ``momentum=0.9`` (fraction of the running average).
  Configs carry the torch convention; we convert here.
* SyncBatchNorm = BatchNorm with ``axis_name="data"`` — flax computes cross-replica
  mean/var with a psum over the mesh axis, replacing the reference's
  torch SyncBatchNorm/NCCL path (reference cvnets/layers/normalization/sync_batch_norm.py).
* LayerNorm2D (channels of an NCHW tensor) is plain LayerNorm over the trailing axis
  in our NHWC layout.
"""

from __future__ import annotations

import argparse
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.utils import logger

SUPPORTED_NORM_FNS = [
    "batch_norm", "batch_norm_2d", "batch_norm_1d", "batch_norm_3d",
    "sync_batch_norm", "sync_batch_norm_fp32",
    "layer_norm", "layer_norm_2d", "layer_norm_fp32",
    "group_norm", "instance_norm", "instance_norm_2d", "identity",
]

# mesh axis over which sync-BN statistics are reduced
SYNC_BN_AXIS_NAME = "data"

# param paths of any normalization layer's learnables (all our norm layers are
# named "*norm*"; flax BN/LN/GN params are "scale"/"bias") — used by
# build_optimizer to zero their updates when norms are frozen
NORM_PARAM_FREEZE_REGEX = r"(^|/)[^/]*norm[^/]*/(scale|bias)$"


class TorchBatchNorm(nn.BatchNorm):
    """flax BatchNorm with torch's running-VAR update semantics.

    torch normalizes with the biased batch variance but tracks the UNBIASED
    variance (Bessel-corrected, ``var * n/(n-1)``) in ``running_var``
    (torch _BatchNorm docs; reference models train under this convention, so
    eval-after-training parity requires it). flax's stock BatchNorm tracks the
    biased variance — a small (~1/n) but systematic drift vs every torch
    checkpoint trained with our Trainer."""

    @nn.compact
    def __call__(self, x, use_running_average=None, *, mask=None):
        from flax.linen import module as _module
        from flax.linen.normalization import (
            _canonicalize_axes,
            _compute_stats,
            _normalize,
        )

        use_running_average = _module.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feature_axes = _canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), feature_shape)
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), feature_shape)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var = _compute_stats(
                x, reduction_axes,
                dtype=self.dtype,
                axis_name=self.axis_name if not self.is_initializing() else None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
                mask=mask,
                force_float32_reductions=self.force_float32_reductions,
            )
            if not self.is_initializing():
                if mask is not None:
                    # _compute_stats computed masked statistics; the Bessel
                    # element count must match (torch raises on n<=1 — here a
                    # masked-out batch degenerates to correction 1.0, which a
                    # caller can detect from the all-False mask itself).
                    bcast = jnp.broadcast_to(mask, x.shape)
                    n = jnp.sum(bcast, axis=reduction_axes, dtype=jnp.float32)
                else:
                    n = 1
                    for ax in reduction_axes:
                        n *= x.shape[ax]
                if self.axis_name is not None:
                    import jax as _jax

                    # With axis_index_groups, only devices in this group
                    # contribute elements to the group statistics.
                    if self.axis_index_groups is not None:
                        group_size = len(self.axis_index_groups[0])
                    else:
                        group_size = _jax.lax.psum(1, self.axis_name)
                    n = n * group_size
                bessel = jnp.maximum(n / jnp.maximum(n - 1, 1), 1.0) if mask is not None \
                    else n / max(n - 1, 1)
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * var * bessel
                )

        return _normalize(
            self, x, mean, var, reduction_axes, feature_axes,
            self.dtype, self.param_dtype, self.epsilon,
            self.use_bias, self.use_scale, self.bias_init, self.scale_init,
            self.force_float32_reductions,
        )


class FrozenBatchNorm(nn.BatchNorm):
    """BatchNorm pinned to its running statistics (torch ``m.eval()`` under
    the reference's freeze_norm_layers, base_model.py:140-156). Call sites
    still pass ``use_running_average=not training``; this ignores it, so the
    running mean/var are used AND never updated. Param freezing
    (requires_grad=False analog) is applied by build_optimizer via
    NORM_PARAM_FREEZE_REGEX."""

    @nn.compact
    def __call__(self, x, use_running_average=None):
        return super().__call__(x, use_running_average=True)


def norms_frozen(opts) -> bool:
    """True when the current build context requested frozen norm layers
    (set by get_model from model.<category>.freeze_batch_norm)."""
    return bool(getattr(opts, "model.normalization.frozen", False))


def get_normalization_layer(
    opts,
    num_features: Optional[int] = None,
    norm_type: Optional[str] = None,
    num_groups: Optional[int] = None,
    eps: float = 1e-5,
):
    """Build a linen normalization module from opts.

    Parity: reference cvnets/layers/normalization_layers.py:109. ``num_features`` is
    accepted for API parity; linen infers feature counts from inputs.
    """
    if norm_type is None:
        norm_type = getattr(opts, "model.normalization.name", "batch_norm")
    torch_momentum = getattr(opts, "model.normalization.momentum", 0.1)
    if torch_momentum is None:
        torch_momentum = 0.1
    flax_momentum = 1.0 - torch_momentum
    norm_type = (norm_type or "batch_norm").lower()

    # keep the activation dtype (bf16 under mixed precision) through norms so convs
    # don't upcast at every boundary; flax computes BN/LN statistics in f32
    # internally regardless of `dtype`
    from cvnets_tpu.layers.dtype_utils import compute_dtype

    dt = compute_dtype(opts)

    # sync_batch_norm: under GSPMD jit the batch axis is sharded but the program
    # is single-logical — plain BN statistics are computed over the GLOBAL batch
    # (XLA inserts the cross-device reductions), i.e. BN is already synchronous.
    # axis_name-based pmean (the shard_map/pmap route) is unnecessary and would
    # fail under jit with "unbound axis name".
    if norm_type in ("batch_norm", "batch_norm_2d", "batch_norm_1d", "batch_norm_3d",
                     "sync_batch_norm"):
        bn_cls = FrozenBatchNorm if norms_frozen(opts) else TorchBatchNorm
        return bn_cls(momentum=flax_momentum, epsilon=eps,
                      use_running_average=None, dtype=dt)
    if norm_type == "sync_batch_norm_fp32":
        bn_cls = FrozenBatchNorm if norms_frozen(opts) else TorchBatchNorm
        return bn_cls(momentum=flax_momentum, epsilon=eps,
                      use_running_average=None, dtype=jnp.float32)
    if norm_type == "layer_norm":
        # reference LayerNorm on channel-first tensors normalizes over the channel
        # dim only (layer_norm.py:53-66) == trailing-axis LN in NHWC
        return nn.LayerNorm(epsilon=eps, dtype=dt, use_fast_variance=False)
    if norm_type == "layer_norm_2d":
        # reference LayerNorm2D_NCHW *extends GroupNorm(num_groups=1)*
        # (layer_norm.py:77): statistics over channels AND spatial dims jointly,
        # per-channel affine — NOT a channel-only LN
        return nn.GroupNorm(num_groups=1, epsilon=eps, dtype=dt, use_fast_variance=False)
    if norm_type == "layer_norm_fp32":
        return nn.LayerNorm(epsilon=eps, dtype=jnp.float32, use_fast_variance=False)
    if norm_type == "group_norm":
        n_groups = num_groups if num_groups is not None else getattr(
            opts, "model.normalization.groups", 32
        )
        return nn.GroupNorm(num_groups=int(n_groups), epsilon=eps, use_fast_variance=False)
    if norm_type in ("instance_norm", "instance_norm_2d"):
        # instance norm == group norm with one channel per group
        return nn.GroupNorm(num_groups=None, group_size=1, epsilon=eps, use_fast_variance=False)
    if norm_type == "identity":
        return None
    logger.error(
        f"Unsupported norm layer `{norm_type}`. Supported: {SUPPORTED_NORM_FNS}"
    )


class AdjustBatchNormMomentum:
    """Anneal the (torch-convention) BN momentum over training.

    Parity: reference cvnets/layers/normalization_layers.py (AdjustBatchNormMomentum);
    cosine or linear annealing from ``momentum`` to ``final_momentum_value`` over
    warmup-excluded epochs. In cvnets_tpu the returned value feeds the train step as a
    scalar (flax momentum = 1 - value).
    """

    round_places = 6

    def __init__(self, opts) -> None:
        import math

        self.is_iteration_based = getattr(opts, "scheduler.is_iteration_based", True)
        self.warmup_iterations = getattr(opts, "scheduler.warmup_iterations", 0) or 0
        if self.is_iteration_based:
            self.max_steps = getattr(opts, "scheduler.max_iterations", 10000) or 10000
            self.max_steps -= self.warmup_iterations
        else:
            self.max_steps = getattr(opts, "scheduler.max_epochs", 100) or 100
        self.momentum = getattr(opts, "model.normalization.momentum", 0.1) or 0.1
        self.min_momentum = getattr(
            opts, "model.normalization.adjust_bn_momentum.final_momentum_value", 1e-6
        )
        self.anneal_type = getattr(
            opts, "model.normalization.adjust_bn_momentum.anneal_type", "cosine"
        )
        self._math = math
        if self.anneal_type not in ("cosine", "linear"):
            logger.error(f"Unsupported BN momentum anneal type {self.anneal_type}")

    def get_momentum(self, epoch: int, iteration: int) -> float:
        step = iteration - self.warmup_iterations if self.is_iteration_based else epoch
        step = max(0, min(step, self.max_steps))
        if self.anneal_type == "cosine":
            m = self.min_momentum + 0.5 * (self.momentum - self.min_momentum) * (
                1 + self._math.cos(self._math.pi * step / self.max_steps)
            )
        else:
            m = self.momentum - (self.momentum - self.min_momentum) * step / self.max_steps
        return round(max(0.0, m), self.round_places)


def arguments_norm_layers(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Normalization layer arguments")
    group.add_argument("--model.normalization.name", type=str, default="batch_norm")
    group.add_argument("--model.normalization.groups", type=int, default=1)
    group.add_argument(
        "--model.normalization.momentum", type=float, default=0.1,
        help="BN momentum in the torch convention (fraction of new batch statistic)",
    )
    group.add_argument("--model.normalization.adjust-bn-momentum.enable",
                       action="store_true")
    group.add_argument("--model.normalization.adjust-bn-momentum.anneal-type",
                       type=str, default="cosine")
    group.add_argument("--model.normalization.adjust-bn-momentum.final-momentum-value",
                       type=float, default=1e-6)
    return parser
