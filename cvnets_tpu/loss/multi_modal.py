"""Multi-modal losses (parity: reference loss_fn/multi_modal_img_text/
contrastive_loss_clip.py:21-131).

TPU delta: the reference needs a differentiable cross-rank all_gather of features
(utils/third_party/ddp_functional_utils.py) and rank-offset labels. Under GSPMD the
jit'd step already computes over the *global* batch, so the loss is a plain in-batch
InfoNCE — the image·textᵀ matmul is sharded by GSPMD and the gradient collectives
are inserted automatically.
"""

from __future__ import annotations

import argparse
from typing import Any

import jax
import jax.numpy as jnp
import optax

from cvnets_tpu.loss import LOSS_REGISTRY
from cvnets_tpu.loss.base_criteria import BaseCriteria


class BaseMultiModalLoss(BaseCriteria):
    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BaseMultiModalLoss:
            return parser
        group = parser.add_argument_group(title="Multi-modal loss arguments")
        group.add_argument("--loss.multi-modal-image-text.name", type=str,
                           default="contrastive_loss_clip")
        return parser


LOSS_REGISTRY.register(name="__base__", type="multi_modal_image_text")(
    BaseMultiModalLoss)


@LOSS_REGISTRY.register(name="contrastive_loss_clip", type="multi_modal_image_text")
class ContrastiveLossClip(BaseMultiModalLoss):
    def __call__(self, input_sample: Any, prediction: Any, target: Any, **kwargs):
        image = prediction["image"]
        text = prediction["text"]
        if text is None or not kwargs.get("training", True):
            # reference returns 0 loss at val (:131)
            return jnp.asarray(0.0)
        scale = prediction.get("logit_scale", 100.0)
        logits_i = scale * image.astype(jnp.float32) @ text.astype(jnp.float32).T
        labels = jnp.arange(image.shape[0])
        loss_i = optax.softmax_cross_entropy_with_integer_labels(logits_i, labels)
        loss_t = optax.softmax_cross_entropy_with_integer_labels(logits_i.T, labels)
        total = 0.5 * (jnp.mean(loss_i) + jnp.mean(loss_t))
        return {"total_loss": total, "image_loss": jnp.mean(loss_i),
                "text_loss": jnp.mean(loss_t)}
