"""Base class for classification backbones.

Parity: reference cvnets/models/classification/base_image_encoder.py:21-445 — the
canonical 5-stage skeleton (``conv_1, layer_1..layer_5, conv_1x1_exp, classifier``),
``extract_end_points_all`` tap points for detection/segmentation, dilation support for
output-stride 8/16, neural-augmentor wiring in the train forward, and
``dummy_input_and_label`` for the config-sweep tests.

TPU notes: tensors are NHWC; gradient checkpointing maps to ``nn.remat`` per stage;
the classifier is GlobalPool → Dropout → Dense.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cvnets_tpu.constants import if_test_env
from cvnets_tpu.models.base_model import BaseAnyNNModel
from cvnets_tpu.models import MODEL_REGISTRY


def call_maybe_training(mod, x, training: bool):
    """Call a stage, passing ``training=`` only if its signature accepts it."""
    import inspect

    fn = mod.__call__ if hasattr(mod, "__call__") else mod
    try:
        params = inspect.signature(fn).parameters
    except (TypeError, ValueError):
        params = {}
    if "training" in params:
        # positional so nn.remat(static_argnums=(1,)) can mark it static
        return mod(x, training)
    return mod(x)


def _stage_call(mod, x, training):
    """Module-first wrapper so ``nn.remat`` can lift a constructed stage."""
    return call_maybe_training(mod, x, training)


@MODEL_REGISTRY.register(name="__base__", type="classification")
class BaseImageEncoder(BaseAnyNNModel):
    opts: Any = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BaseImageEncoder:
            return parser
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.classification.classifier-dropout", type=float, default=0.0)
        group.add_argument("--model.classification.name", type=str, default=None)
        group.add_argument("--model.classification.n-classes", type=int, default=1000)
        group.add_argument("--model.classification.pretrained", type=str, default=None)
        group.add_argument("--model.classification.freeze-batch-norm", action="store_true")
        group.add_argument("--model.classification.activation.name", type=str, default=None)
        group.add_argument("--model.classification.activation.inplace", action="store_true")
        group.add_argument("--model.classification.activation.neg-slope", type=float, default=0.1)
        group.add_argument("--model.classification.finetune-pretrained-model", action="store_true")
        group.add_argument("--model.classification.n-pretrained-classes", type=int, default=None)
        group.add_argument("--model.classification.gradient-checkpointing", action="store_true")
        group.add_argument("--model.classification.enable-layer-wise-lr-decay",
                           action="store_true", default=False)
        group.add_argument("--model.classification.layer-wise-lr-decay-rate",
                           type=float, default=1.0)
        return parser

    # ------------------------------------------------------------------ config
    @property
    def n_classes(self) -> int:
        return getattr(self.opts, "model.classification.n_classes", 1000)

    @property
    def classifier_dropout(self) -> float:
        return getattr(self.opts, "model.classification.classifier_dropout", 0.0) or 0.0

    @property
    def gradient_checkpointing(self) -> bool:
        return getattr(self.opts, "model.classification.gradient_checkpointing", False)

    # model_conf_dict must be populated by subclasses in setup():
    #   {"conv1": {"in": 3, "out": C}, "layer1": {...}, ..., "exp_before_cls": {...},
    #    "cls": {...}}   (reference check_model, base_image_encoder.py:150)

    def get_lr_multipliers(self, opts) -> Dict[str, float]:
        """Layer-wise LR decay for every 5-stage encoder (reference exposes
        the flags on the encoder base, base_image_encoder.py:303/322; ViT
        overrides with its per-transformer-block schedule). Stage i of n gets
        rate ** (n - i); the classifier stays at 1.0 — the finetuning
        convention."""
        if not getattr(opts, "model.classification.enable_layer_wise_lr_decay",
                       False):
            return {}
        rate = getattr(opts, "model.classification.layer_wise_lr_decay_rate",
                       1.0) or 1.0
        if rate == 1.0:
            return {}
        stages = ["conv_1", "layer_1", "layer_2", "layer_3", "layer_4",
                  "layer_5", "conv_1x1_exp"]
        n = len(stages)
        # list-valued stages flatten to scope names like "layer_2_0"; match
        # both spellings without touching e.g. conv_1x1_exp from ^conv_1
        return {rf"^{s}(?:/|_\d)": round(rate ** (n - i), 5)
                for i, s in enumerate(stages)}

    # ----------------------------------------------------------------- forward
    def _stage(self, name: str):
        """Return the stage module, or None when the subclass omits it."""
        return getattr(self, name, None)

    def _run_stage(self, mod, x: jnp.ndarray, training: bool) -> jnp.ndarray:
        if mod is None:
            return x
        if isinstance(mod, (list, tuple)):
            for m in mod:
                x = self._run_stage(m, x, training)
            return x
        if self.gradient_checkpointing and training:
            # per-stage rematerialization (reference wraps stages in
            # torch.utils.checkpoint; here jax.checkpoint via the lifted
            # nn.remat — activations recomputed in backward, same numerics).
            # ``training`` must be positional+static (argnum offset: module=0).
            return nn.remat(_stage_call, static_argnums=(2,))(mod, x, training)
        return call_maybe_training(mod, x, training)

    def extract_features_temporal(
        self, x: jnp.ndarray, prev_patches=None, training: bool = False,
    ):
        """Temporal forward for video: every MobileViT block cross-attends to
        the SAME block's previous-frame post-norm patches
        (reference mobilevit_block.py forward_temporal :290-327/:628-662,
        which has no caller in the reference tree — this is the model-level
        routing for it). Returns (features, {block_key: patches}) so the
        caller chains patches frame to frame."""
        from cvnets_tpu.modules.mobilevit_block import (
            MobileViTBlock,
            MobileViTBlockv2,
        )

        prev = prev_patches or {}
        new_patches = {}

        def run(mod, h, key):
            if mod is None:
                return h
            if isinstance(mod, (list, tuple)):
                for k, m in enumerate(mod):
                    h = run(m, h, f"{key}.{k}")
                return h
            if isinstance(mod, (MobileViTBlock, MobileViTBlockv2)):
                h, p = mod(h, x_prev=prev.get(key), training=training,
                           return_patches=True)
                new_patches[key] = p
                return h
            return call_maybe_training(mod, h, training)

        for name in ("conv_1", "layer_1", "layer_2", "layer_3", "layer_4",
                     "layer_5", "conv_1x1_exp"):
            x = run(self._stage(name), x, name)
        return x, new_patches

    def extract_end_points_all(
        self,
        x: jnp.ndarray,
        use_l5: bool = True,
        use_l5_exp: bool = False,
        training: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Tap points for detection/segmentation heads (reference :206)."""
        out: Dict[str, jnp.ndarray] = {}
        x = self._run_stage(self._stage("conv_1"), x, training)
        x = self._run_stage(self._stage("layer_1"), x, training)
        out["out_l1"] = x
        x = self._run_stage(self._stage("layer_2"), x, training)
        out["out_l2"] = x
        x = self._run_stage(self._stage("layer_3"), x, training)
        out["out_l3"] = x
        x = self._run_stage(self._stage("layer_4"), x, training)
        out["out_l4"] = x
        if use_l5:
            x = self._run_stage(self._stage("layer_5"), x, training)
            out["out_l5"] = x
            if use_l5_exp:
                x = self._run_stage(self._stage("conv_1x1_exp"), x, training)
                out["out_l5_exp"] = x
        return out

    def extract_end_points_l4(self, x, training: bool = False) -> Dict[str, jnp.ndarray]:
        return self.extract_end_points_all(x, use_l5=False, training=training)

    def extract_features(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        for name in ("conv_1", "layer_1", "layer_2", "layer_3", "layer_4",
                     "layer_5", "conv_1x1_exp"):
            x = self._run_stage(self._stage(name), x, training)
        return x

    def forward_classifier(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        x = self.extract_features(x, training=training)
        return self._run_stage(self._stage("classifier"), x, training)

    def __call__(self, x: jnp.ndarray, training: bool = False) -> Any:
        augmentor = self._stage("neural_augmentor")
        if augmentor is not None:
            # always CALL the augmentor so its params exist in the eval/init
            # trace; it passes through unchanged when not training
            x = augmentor(x, training=training)
            logits = self.forward_classifier(x, training=training)
            if training:
                return {"augmented_tensor": x, "logits": logits}
            return logits
        return self.forward_classifier(x, training=training)

    # ------------------------------------------------------------------- tests
    def dummy_input_and_label(self, batch_size: int) -> Dict[str, Any]:
        """Random NHWC input + labels (reference :335-349; 32px under pytest)."""
        img_h = if_test_env(32, 224)
        img_w = if_test_env(32, 224)
        rng = np.random.default_rng(0)
        samples = jnp.asarray(
            rng.standard_normal((batch_size, img_h, img_w, 3), dtype=np.float32)
        )
        targets = jnp.asarray(rng.integers(0, self.n_classes, (batch_size,)))
        return {"samples": samples, "targets": targets}


class Classifier(nn.Module):
    """GlobalPool → Dropout → Dense head shared by the classification models."""

    opts: Any
    n_classes: int
    dropout: float = 0.0
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        from cvnets_tpu.layers.pool import GlobalPool
        from cvnets_tpu.layers.dtype_utils import compute_dtype
        from cvnets_tpu.layers.init_utils import linear_init

        from cvnets_tpu.quantization import quant_dense

        pool_type = getattr(self.opts, "model.layer.global_pool", "mean")
        x = GlobalPool(pool_type=pool_type, name="global_pool")(x)
        if self.dropout > 0.0:
            x = nn.Dropout(rate=self.dropout, deterministic=not training)(x)
        return quant_dense(
            self.opts, training, self.n_classes, use_bias=self.bias,
            kernel_init=linear_init(self.opts), dtype=compute_dtype(self.opts),
            name="fc",
        )(x)


def set_model_specific_opts_before_model_building(opts) -> Dict[str, Any]:
    """Push model.classification.activation.* over model.activation.* during build
    (reference :391-445); returns the original values for restoration."""
    default_act = getattr(opts, "model.activation.name", "relu")
    cls_act = getattr(opts, "model.classification.activation.name", None)
    saved = {"model.activation.name": default_act}
    if cls_act is not None:
        setattr(opts, "model.activation.name", cls_act)
    return saved


def unset_model_specific_opts_after_model_building(opts, saved: Dict[str, Any]) -> None:
    for k, v in saved.items():
        setattr(opts, k, v)
