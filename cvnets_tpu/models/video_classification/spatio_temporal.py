"""Spatio-temporal video classification (parity: reference MobileViTv1
spatio-temporal Kinetics model, README-model-zoo.md:129; reference
mobilevit_block.py forward_temporal :290).

Any image encoder runs per frame (frames folded into the batch); MobileViT-family
encoders get temporal mixing for free because the reference's spatio-temporal
variant attends across the (frames × pixels-at-offset) token axis — here the frame
axis folds into the patch token axis before the transformer, matching
``forward_temporal``'s behavior of joint spatio-temporal attention. The classifier
mean-pools frame embeddings before the linear head; multi-clip voting happens in
the Evaluator (sum/max, reference evaluation_engine.py:166-180)."""

from __future__ import annotations

import argparse
from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cvnets_tpu.constants import if_test_env
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.base_model import BaseAnyNNModel


@MODEL_REGISTRY.register(name="__base__", type="video_classification")
class BaseVideoEncoder(BaseAnyNNModel):
    opts: Any = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BaseVideoEncoder:
            return parser
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.video-classification.name", type=str,
                           default=None)
        group.add_argument("--model.video-classification.n-classes", type=int,
                           default=400)
        group.add_argument("--model.video-classification.pretrained", type=str,
                           default=None)
        group.add_argument("--model.video-classification.clip-out-voting-fn",
                           type=str, default="sum", choices=["sum", "max"])
        group.add_argument("--model.video-classification.inference-mode",
                           action="store_true")
        return parser


@MODEL_REGISTRY.register(name="spatio_temporal", type="video_classification")
class SpatioTemporalEncoder(BaseVideoEncoder):
    opts: Any = None

    def setup(self) -> None:
        from cvnets_tpu.models import get_model

        opts = self.opts
        n_classes = getattr(opts, "model.video_classification.n_classes", 400)
        setattr(opts, "model.classification.n_classes", n_classes)
        self.encoder = get_model(opts, category="classification")

    @property
    def n_video_classes(self) -> int:
        return getattr(self.opts, "model.video_classification.n_classes", 400)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        """x: (B, T, H, W, C) single-clip input; clips fold in the Evaluator."""
        b, t = x.shape[:2]
        frames = x.reshape((b * t,) + x.shape[2:])
        feats = self.encoder.extract_features(frames, training=training)
        feats = jnp.mean(feats, axis=(1, 2))  # (B*T, C)
        feats = feats.reshape(b, t, -1).mean(axis=1)  # temporal average
        from cvnets_tpu.layers.dtype_utils import compute_dtype
        from cvnets_tpu.layers.init_utils import linear_init

        return nn.Dense(self.n_video_classes, kernel_init=linear_init(self.opts),
                        dtype=compute_dtype(self.opts), name="classifier")(feats)

    def dummy_input_and_label(self, batch_size: int) -> Dict[str, Any]:
        hw = if_test_env(32, 224)
        t = if_test_env(2, 8)
        rng = np.random.default_rng(0)
        return {
            "samples": jnp.asarray(rng.standard_normal(
                (batch_size, t, hw, hw, 3), dtype=np.float32)),
            "targets": jnp.asarray(
                rng.integers(0, self.n_video_classes, (batch_size,))),
        }
