"""Optimizer construction on optax (parity: reference optim/__init__.py:24-109).

The reference wraps torch.optim with param groups; here ``build_optimizer`` returns an
``optax.GradientTransformation`` wrapped in ``inject_hyperparams`` so the per-iteration
learning rate computed by the scheduler (reference semantics, including warmup and
rounding) is written into optimizer state inside the jit'd train step.

Weight decay: ``optim.no_decay_bn_filter_bias`` masks decay to rank>1 kernels —
biases and norm scales/biases are rank<=1 leaves, exactly matching the reference's
parameter_list split (reference cvnets/misc/common.py:122-176).
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Optional

import jax
import optax

from cvnets_tpu.utils import logger
from cvnets_tpu.utils.registry import Registry

OPTIM_REGISTRY = Registry(registry_name="optimizer")


def arguments_optimizer(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Optimizer arguments")
    group.add_argument("--optim.name", type=str, default="sgd")
    group.add_argument("--optim.eps", type=float, default=1e-8)
    group.add_argument("--optim.weight-decay", type=float, default=4e-5)
    group.add_argument("--optim.no-decay-bn-filter-bias", action="store_true",
                       default=False)
    group.add_argument("--optim.bypass-parameters-check", action="store_true",
                       default=False,
                       help="Config-compat; coverage check is implicit in pytree opts")
    # per-optimizer flags registered below
    return OPTIM_REGISTRY.all_arguments(parser)


def _decay_mask(params) -> Any:
    """True for leaves that receive weight decay (rank>1 kernels)."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def _scale_by_amsgrad_torch(b1: float, b2: float,
                            eps: float) -> optax.GradientTransformation:
    """torch-semantics AMSGrad: vmax tracks the RAW second moment and bias
    correction divides at use time (``sqrt(max_v / bc2)``). optax's own
    ``scale_by_amsgrad`` maxes the bias-CORRECTED moment, which diverges from
    ``torch.optim.Adam(amsgrad=True)`` while bc2 is still moving."""
    import jax.numpy as jnp

    def init(params):
        zeros = lambda p: jnp.zeros_like(p)  # noqa: E731
        return {
            "count": jnp.zeros([], jnp.int32),
            "m": jax.tree_util.tree_map(zeros, params),
            "v": jax.tree_util.tree_map(zeros, params),
            "vmax": jax.tree_util.tree_map(zeros, params),
        }

    def update(grads, state, params=None):
        del params
        count = state["count"] + 1
        m = jax.tree_util.tree_map(
            lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = jax.tree_util.tree_map(
            lambda v_, g: b2 * v_ + (1 - b2) * g * g, state["v"], grads)
        vmax = jax.tree_util.tree_map(jnp.maximum, state["vmax"], v)
        c = count.astype(jnp.float32)
        bc1 = 1 - b1 ** c
        bc2 = 1 - b2 ** c
        updates = jax.tree_util.tree_map(
            lambda m_, vm: (m_ / bc1) / (jnp.sqrt(vm / bc2) + eps), m, vmax)
        return updates, {"count": count, "m": m, "v": v, "vmax": vmax}

    return optax.GradientTransformation(init, update)


class BaseOptim:
    """Registered optimizers implement ``make(opts, wd_mask) -> fn(learning_rate)``."""

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        return parser


@OPTIM_REGISTRY.register("sgd")
class SGDOptimizer(BaseOptim):
    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(title="SGD arguments")
        group.add_argument("--optim.sgd.momentum", type=float, default=0.9)
        group.add_argument("--optim.sgd.nesterov", action="store_true", default=False)
        return parser

    @staticmethod
    def make(opts, wd, mask_fn):
        momentum = getattr(opts, "optim.sgd.momentum", 0.9)
        nesterov = getattr(opts, "optim.sgd.nesterov", False)

        def factory(learning_rate):
            # torch-SGD semantics: (coupled) L2 added to grad before momentum
            parts = []
            if wd and wd > 0:
                parts.append(optax.add_decayed_weights(wd, mask=mask_fn))
            parts.append(
                optax.sgd(learning_rate, momentum=momentum, nesterov=nesterov)
            )
            return optax.chain(*parts)

        return factory


@OPTIM_REGISTRY.register("adam")
class AdamOptimizer(BaseOptim):
    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(title="Adam arguments")
        group.add_argument("--optim.adam.beta1", type=float, default=0.9)
        group.add_argument("--optim.adam.beta2", type=float, default=0.999)
        group.add_argument("--optim.adam.amsgrad", action="store_true", default=False)
        group.add_argument("--optim.adam.eps", type=float, default=None,
                           help="Overrides --optim.eps for Adam when set")
        return parser

    @staticmethod
    def make(opts, wd, mask_fn):
        b1 = getattr(opts, "optim.adam.beta1", 0.9)
        b2 = getattr(opts, "optim.adam.beta2", 0.999)
        eps = getattr(opts, "optim.adam.eps", None) or getattr(
            opts, "optim.eps", 1e-8)
        amsgrad = getattr(opts, "optim.adam.amsgrad", False)

        def factory(learning_rate):
            # torch Adam applies coupled L2 (not decoupled)
            parts = []
            if wd and wd > 0:
                parts.append(optax.add_decayed_weights(wd, mask=mask_fn))
            if amsgrad:
                parts.extend([
                    _scale_by_amsgrad_torch(b1=b1, b2=b2, eps=eps),
                    optax.scale_by_learning_rate(learning_rate),
                ])
            else:
                parts.append(optax.adam(learning_rate, b1=b1, b2=b2, eps=eps))
            return optax.chain(*parts)

        return factory


@OPTIM_REGISTRY.register("adamw")
class AdamWOptimizer(BaseOptim):
    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(title="AdamW arguments")
        group.add_argument("--optim.adamw.beta1", type=float, default=0.9)
        group.add_argument("--optim.adamw.beta2", type=float, default=0.999)
        group.add_argument("--optim.adamw.amsgrad", action="store_true", default=False)
        group.add_argument("--optim.adamw.eps", type=float, default=None,
                           help="Overrides --optim.eps for AdamW when set")
        return parser

    @staticmethod
    def make(opts, wd, mask_fn):
        b1 = getattr(opts, "optim.adamw.beta1", 0.9)
        b2 = getattr(opts, "optim.adamw.beta2", 0.999)
        eps = getattr(opts, "optim.adamw.eps", None) or getattr(
            opts, "optim.eps", 1e-8)
        amsgrad = getattr(opts, "optim.adamw.amsgrad", False)

        def factory(learning_rate):
            if amsgrad:
                # decoupled wd around the amsgrad moment update (torch
                # AdamW(amsgrad=True) semantics)
                return optax.chain(
                    _scale_by_amsgrad_torch(b1=b1, b2=b2, eps=eps),
                    optax.add_decayed_weights(wd or 0.0, mask=mask_fn),
                    optax.scale_by_learning_rate(learning_rate),
                )
            return optax.adamw(
                learning_rate, b1=b1, b2=b2, eps=eps,
                weight_decay=wd or 0.0, mask=mask_fn,
            )

        return factory


def build_optimizer(
    opts,
    lr_multipliers: Optional[Dict[str, float]] = None,
) -> optax.GradientTransformation:
    """Build the optimizer named by ``optim.name``.

    Args:
        lr_multipliers: optional map of param-path regex -> multiplier (reference
            per-group lr_mult, e.g. MaskRCNN heads / seg enc-dec split). Applied as a
            masked scale after the base update.

    Returns an ``inject_hyperparams``-wrapped transformation whose
    ``state.hyperparams["learning_rate"]`` the train step sets each iteration.
    """
    optim_name = (getattr(opts, "optim.name", "sgd") or "sgd").lower()
    wd = getattr(opts, "optim.weight_decay", 0.0) or 0.0
    no_decay_bn = getattr(opts, "optim.no_decay_bn_filter_bias", False)
    mask_fn = _decay_mask if no_decay_bn else None

    if optim_name not in OPTIM_REGISTRY:
        logger.error(
            f"Unsupported optimizer {optim_name}; supported: {list(OPTIM_REGISTRY.keys())}"
        )
    factory = OPTIM_REGISTRY[optim_name].make(opts, wd, mask_fn)

    # frozen scopes get zeroed updates (reference freeze_modules_based_on_opts,
    # cvnets/misc/common.py:213 — requires_grad=False analog)
    freeze = getattr(opts, "model.freeze_modules", "") or ""
    freeze_patterns = [p.strip() for p in freeze.split(",") if p.strip()]
    if getattr(opts, "model.normalization.frozen", False):
        # freeze_batch_norm: norm scales/biases get no updates (reference
        # base_model.py:152-154 requires_grad=False); forward-side pinning to
        # running stats is done by FrozenBatchNorm
        from cvnets_tpu.layers.normalization import NORM_PARAM_FREEZE_REGEX

        freeze_patterns.append(NORM_PARAM_FREEZE_REGEX)
    if freeze_patterns:
        import re as _re

        base_factory_frozen = factory
        rxs = [_re.compile(p) for p in freeze_patterns]

        def _freeze_mask(params):
            def walk(node, path):
                if isinstance(node, dict):
                    return {k: walk(v, f"{path}/{k}" if path else k)
                            for k, v in node.items()}
                return any(rx.search(path) for rx in rxs)

            return walk(params, "")

        def factory(learning_rate):
            return optax.chain(
                base_factory_frozen(learning_rate),
                optax.masked(optax.set_to_zero(), _freeze_mask),
            )

    if lr_multipliers:
        import re

        base_factory = factory

        def factory(learning_rate):
            parts = [base_factory(learning_rate)]
            for pattern, mult in lr_multipliers.items():
                if mult == 1.0:
                    continue
                rx = re.compile(pattern)

                def mk_mask(rx):
                    def mask(params):
                        flat = {}

                        def walk(node, path):
                            if isinstance(node, dict):
                                return {
                                    k: walk(v, f"{path}/{k}" if path else k)
                                    for k, v in node.items()
                                }
                            return bool(rx.search(path))

                        return walk(params, "")

                    return mask

                parts.append(
                    optax.masked(optax.scale(mult), mk_mask(rx))
                )
            return optax.chain(*parts)

    return optax.inject_hyperparams(factory)(learning_rate=0.0)
