"""Encoder-decoder segmentation model (parity: reference
cvnets/models/segmentation/enc_dec.py:21): encoder ``extract_end_points_all`` →
registered seg head; logits upsampled to input resolution; optional aux head."""

from __future__ import annotations

import argparse
from typing import Any, Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

from cvnets_tpu.constants import if_test_env
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.segmentation.base_seg import BaseSegmentation


@MODEL_REGISTRY.register(name="encoder_decoder", type="segmentation")
class SegEncoderDecoder(BaseSegmentation):
    opts: Any = None

    def setup(self) -> None:
        opts = self.opts
        from cvnets_tpu.models import get_model

        output_stride = getattr(opts, "model.segmentation.output_stride", None)
        kwargs = {}
        if output_stride in (8, 16):
            kwargs["output_stride"] = output_stride
        self.encoder = get_model(opts, category="classification", **kwargs)

        head_name = getattr(opts, "model.segmentation.seg_head", "deeplabv3")
        # --model.segmentation.norm-layer overrides the norm INSIDE the head
        # only (reference base_seg.py:151); the encoder keeps the global norm
        head_opts = opts
        seg_norm = getattr(opts, "model.segmentation.norm_layer", None)
        if seg_norm:
            head_opts = argparse.Namespace(**vars(opts))
            setattr(head_opts, "model.normalization.name", seg_norm)
        self.seg_head = MODEL_REGISTRY[head_name,
                                       "segmentation_head"].build_model(head_opts)
        self.use_l5_exp = getattr(opts, "model.segmentation.use_level5_exp", False)
        self.upsample_train_logits = getattr(
            opts, "model.segmentation.upsample_train_logits", False)

    def __call__(self, x: jnp.ndarray, training: bool = False
                 ) -> Union[jnp.ndarray, Dict[str, jnp.ndarray]]:
        in_hw = x.shape[1:3]
        end_points = self.encoder.extract_end_points_all(
            x, use_l5=True, use_l5_exp=self.use_l5_exp, training=training
        )
        out = self.seg_head(end_points, training=training)
        if training and not self.upsample_train_logits:
            # Train-time: return head-resolution logits; the seg CE loss
            # fuses the bilinear resize into a tiled resize+CE (ops/seg_ce.py)
            # so the (B, H, W, C) full-res tensor never exists. Eval below
            # keeps the reference's full-res output (base_seg_head upsampling).
            return out
        # upsample logits to input resolution (reference base_seg_head upsampling)
        def up(y):
            return jax.image.resize(
                y, (y.shape[0], in_hw[0], in_hw[1], y.shape[-1]), method="bilinear"
            )

        if isinstance(out, dict):
            return {k: up(v) for k, v in out.items()}
        return up(out)

    def dummy_input_and_label(self, batch_size: int) -> Dict[str, Any]:
        im_h = if_test_env(64, 512)
        im_w = if_test_env(64, 512)
        rng = np.random.default_rng(0)
        return {
            "samples": jnp.asarray(
                rng.standard_normal((batch_size, im_h, im_w, 3), dtype=np.float32)),
            "targets": jnp.asarray(
                rng.integers(0, self.n_seg_classes, (batch_size, im_h, im_w))),
        }
