"""Spatio-temporal video classification (parity: reference MobileViTv1
spatio-temporal Kinetics model, README-model-zoo.md:129; reference
mobilevit_block.py forward_temporal :290-327 and :628-662).

MobileViT-family encoders run frame by frame through
``extract_features_temporal``: each MobileViT block CROSS-ATTENDS to its own
previous-frame post-norm patches (q from the current frame, k/v from the
previous frame — the reference's temporal attention), so information flows
along time through the patch tokens. Other encoders fall back to per-frame
forwarding with frames folded into the batch (no temporal mixing — the
reference defines temporal attention only for MobileViT blocks). The
classifier mean-pools per-frame embeddings before the linear head; multi-clip
voting happens in the Evaluator (sum/max, reference
evaluation_engine.py:166-180)."""

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

    @property
    def _temporal_encoder(self) -> bool:
        name = getattr(self.opts, "model.classification.name", "") or ""
        return "mobilevit" in name

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        """x: (B, T, H, W, C) single-clip input; clips fold in the Evaluator."""
        b, t = x.shape[:2]
        if self._temporal_encoder:
            # frame-recurrent temporal attention: block patches from frame
            # t-1 are the cross-attention context at frame t (params shared
            # across frames — one encoder, T applications)
            prev = None
            per_frame = []
            for ti in range(t):
                feats, prev = self.encoder.extract_features_temporal(
                    x[:, ti], prev, training=training)
                per_frame.append(jnp.mean(feats, axis=(1, 2)))  # (B, C)
            feats = jnp.stack(per_frame, axis=1).mean(axis=1)
        else:
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
