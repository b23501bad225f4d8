"""CLIP (parity: reference cvnets/models/multi_modal_img_text/clip.py:27-255).

Image encoder = any registered classification model with the classifier swapped for
a projection head (reference update_image_classifier :248); text encoder from the
text-encoder registry; learnable ``logit_scale``. The zero-shot path consumes
pre-computed per-class caption embeddings and returns 100·img@text logits
(reference :184-202)."""

from __future__ import annotations

import argparse
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cvnets_tpu.constants import if_test_env
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.multi_modal.base_multi_modal import BaseMultiModalImageText
from cvnets_tpu.models.multi_modal.image_projection import (
    IMAGE_PROJECTION_HEAD_REGISTRY,
)
from cvnets_tpu.models.multi_modal.text_encoders import TEXT_ENCODER_REGISTRY


@MODEL_REGISTRY.register(name="clip", type="multi_modal_image_text")
class CLIP(BaseMultiModalImageText):
    opts: Any = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.multi-modal-image-text.clip.projection-dim",
                           type=int, default=256)
        return parser

    @property
    def projection_dim(self) -> int:
        return getattr(self.opts,
                       "model.multi_modal_image_text.clip.projection_dim", 256)

    def setup(self) -> None:
        opts = self.opts
        from cvnets_tpu.models import get_model

        self.image_encoder = get_model(opts, category="classification")
        head_name = getattr(opts, "model.image_projection_head.name", None) \
            or "global_pool_nchw2nc"
        self.image_projection = IMAGE_PROJECTION_HEAD_REGISTRY[head_name](
            opts=opts, in_dim=512, out_dim=self.projection_dim,
        )
        text_name = getattr(opts, "model.text.name", None) or "transformer"
        self.text_encoder = TEXT_ENCODER_REGISTRY[text_name](
            opts=opts, projection_dim=self.projection_dim,
        )
        self.logit_scale = self.param(
            "logit_scale", lambda _k: jnp.asarray(np.log(1.0 / 0.07), jnp.float32)
        )

    def get_lr_multipliers(self, opts):
        """Per-tower LR multipliers (reference
        base_multi_modal_img_text.py:21-25): regex over the param path ->
        multiplier, consumed by build_optimizer."""
        mults = {}
        img = getattr(
            opts, "model.multi_modal_image_text.lr_multiplier_img_encoder", 1.0)
        txt = getattr(
            opts, "model.multi_modal_image_text.lr_multiplier_text_encoder", 1.0)
        if img and img != 1.0:
            mults["^image_encoder/"] = float(img)
        if txt and txt != 1.0:
            mults["^text_encoder/"] = float(txt)
        return mults

    def encode_image(self, image: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        feats = self.image_encoder.extract_features(image, training=training)
        feats = self.image_projection(feats, training=training)
        return feats / jnp.linalg.norm(
            feats.astype(jnp.float32), axis=-1, keepdims=True
        ).astype(feats.dtype)

    def encode_text(self, text: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        feats = self.text_encoder(text, training=training)
        return feats / jnp.linalg.norm(
            feats.astype(jnp.float32), axis=-1, keepdims=True
        ).astype(feats.dtype)

    def __call__(self, input_dict: Dict, training: bool = False) -> Dict:
        image = input_dict.get("image") if isinstance(input_dict, dict) else input_dict
        text = input_dict.get("text") if isinstance(input_dict, dict) else None

        image_emb = self.encode_image(image, training=training) \
            if image is not None else None
        if text is None:
            return {"image": image_emb, "text": None,
                    "logit_scale": jnp.exp(self.logit_scale)}

        # zero-shot: text is (n_classes, proj_dim) precomputed class embeddings
        if text.ndim == 2 and not jnp.issubdtype(text.dtype, jnp.integer):
            logits = 100.0 * image_emb @ text.T.astype(image_emb.dtype)
            return {"image": image_emb, "text": text,
                    "zero_shot_image_logits": logits,
                    "logit_scale": jnp.exp(self.logit_scale)}

        text_emb = self.encode_text(text, training=training)
        return {
            "image": image_emb,
            "text": text_emb,
            "logit_scale": jnp.exp(self.logit_scale),
        }

    def dummy_input_and_label(self, batch_size: int) -> Dict[str, Any]:
        im = if_test_env(32, 224)
        ctx = getattr(self.opts, "model.text.context_length", 77)
        vocab = getattr(self.opts, "model.text.vocab_size", 49408)
        rng = np.random.default_rng(0)
        return {
            "samples": {
                "image": jnp.asarray(
                    rng.standard_normal((batch_size, im, im, 3), dtype=np.float32)),
                "text": jnp.asarray(
                    rng.integers(1, vocab, (batch_size, ctx)), jnp.int32),
            },
            "targets": jnp.arange(batch_size),
        }
