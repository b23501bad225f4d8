"""Distillation losses (parity: reference loss_fn/distillation/*).

The frozen teacher is built from ``--teacher.model.*`` opts cloned back onto a
``model.*`` namespace (reference base_distillation.py:16-26, options/utils.py:103-148)
and its forward runs inside the jit'd loss; its params are captured constants, so XLA
fuses the teacher forward into the train step with no extra host sync.
"""

from __future__ import annotations

import argparse
from typing import Any

import jax
import jax.numpy as jnp
import optax

from cvnets_tpu.loss import LOSS_REGISTRY
from cvnets_tpu.loss.base_criteria import BaseCriteria
from cvnets_tpu.options.utils import extract_opts_with_prefix_replacement
from cvnets_tpu.utils import logger


class BaseDistillationCriteria(BaseCriteria):
    def __init__(self, opts, *args, **kwargs) -> None:
        super().__init__(opts)
        from cvnets_tpu.models import get_model

        teacher_opts = extract_opts_with_prefix_replacement(
            opts, "teacher.model.", "model."
        )
        # copy non-model opts the model build needs
        for k, v in vars(opts).items():
            if not k.startswith("model.") and not hasattr(teacher_opts, k):
                setattr(teacher_opts, k, v)
        category = getattr(opts, "loss.category", "distillation")
        model_category = "classification"
        self.teacher = get_model(teacher_opts, category=model_category)
        rng = jax.random.PRNGKey(getattr(opts, "common.seed", 0) or 0)
        dummy = self.teacher.dummy_input_and_label(2)
        variables = self.teacher.init({"params": rng, "dropout": rng},
                                      dummy["samples"], training=False)
        pretrained = getattr(teacher_opts, "model.classification.pretrained", None)
        if pretrained:
            from cvnets_tpu.utils.checkpoint_utils import load_model_weights

            params, bs = load_model_weights(
                pretrained, variables.get("params", {}),
                variables.get("batch_stats", {}),
            )
            variables = dict(variables, params=params)
            if bs:
                variables["batch_stats"] = bs
        self.teacher_variables = jax.tree_util.tree_map(
            jax.lax.stop_gradient, variables
        )

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BaseDistillationCriteria:
            return parser
        group = parser.add_argument_group(title="Distillation loss arguments")
        group.add_argument("--loss.distillation.name", type=str, default="soft_kl_loss")
        return parser

    def _teacher_logits(self, input_sample: jnp.ndarray) -> jnp.ndarray:
        out = self.teacher.apply(self.teacher_variables, input_sample, training=False)
        if isinstance(out, dict):
            out = out.get("logits", next(iter(out.values())))
        return jax.lax.stop_gradient(out)


LOSS_REGISTRY.register(name="__base__", type="distillation")(BaseDistillationCriteria)


@LOSS_REGISTRY.register(name="soft_kl_loss", type="distillation")
class SoftKLLoss(BaseDistillationCriteria):
    """KL(student || teacher) with temperature (reference
    loss_fn/distillation/soft_kl_loss.py)."""

    def __init__(self, opts, *args, **kwargs) -> None:
        super().__init__(opts, *args, **kwargs)
        self.temperature = getattr(opts, "loss.distillation.soft_kl_loss.temperature",
                                   1.0) or 1.0

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--loss.distillation.soft-kl-loss.temperature",
                           type=float, default=1.0)
        return parser

    def __call__(self, input_sample: Any, prediction: Any, target: Any, **kwargs):
        student = prediction["logits"] if isinstance(prediction, dict) else prediction
        teacher = self._teacher_logits(input_sample)
        t = self.temperature
        log_p = jax.nn.log_softmax(student.astype(jnp.float32) / t, axis=-1)
        q = jax.nn.softmax(teacher.astype(jnp.float32) / t, axis=-1)
        kl = jnp.sum(q * (jnp.log(jnp.maximum(q, 1e-12)) - log_p), axis=-1)
        return jnp.mean(kl) * (t * t)


@LOSS_REGISTRY.register(name="hard_distillation", type="distillation")
class HardDistillationLoss(BaseDistillationCriteria):
    """CE against the teacher's argmax labels (reference
    loss_fn/distillation/hard_distillation.py)."""

    def __call__(self, input_sample: Any, prediction: Any, target: Any, **kwargs):
        student = prediction["logits"] if isinstance(prediction, dict) else prediction
        teacher_labels = jnp.argmax(self._teacher_logits(input_sample), axis=-1)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            student.astype(jnp.float32), teacher_labels
        )
        return jnp.mean(losses)
