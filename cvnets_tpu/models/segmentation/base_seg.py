"""Base segmentation model + seg-head registry (parity: reference
cvnets/models/segmentation/base_seg.py:16 + heads/base_seg_head.py:19)."""

from __future__ import annotations

import argparse
from typing import Any

from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.base_model import BaseAnyNNModel


@MODEL_REGISTRY.register(name="__base__", type="segmentation")
class BaseSegmentation(BaseAnyNNModel):
    opts: Any = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BaseSegmentation:
            return parser
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.segmentation.name", type=str, default=None)
        group.add_argument("--model.segmentation.n-classes", type=int, default=21)
        group.add_argument("--model.segmentation.pretrained", type=str, default=None)
        group.add_argument("--model.segmentation.lr-multiplier", type=float,
                           default=1.0)
        group.add_argument("--model.segmentation.classifier-dropout", type=float,
                           default=0.1)
        group.add_argument("--model.segmentation.use-aux-head", action="store_true")
        group.add_argument("--model.segmentation.aux-dropout", type=float, default=0.1)
        group.add_argument("--model.segmentation.norm-layer", type=str,
                           default=None,
                           help="Norm layer for the segmentation head only "
                                "(reference base_seg.py:151)")
        group.add_argument("--model.segmentation.output-stride", type=int,
                           default=None)
        group.add_argument("--model.segmentation.replace-stride-with-dilation",
                           action="store_true")
        group.add_argument("--model.segmentation.activation.name", type=str,
                           default=None)
        group.add_argument("--model.segmentation.activation.inplace",
                           action="store_true")
        group.add_argument("--model.segmentation.activation.neg-slope", type=float,
                           default=0.1)
        group.add_argument("--model.segmentation.seg-head", type=str,
                           default="deeplabv3")
        group.add_argument("--model.segmentation.freeze-batch-norm",
                           action="store_true")
        group.add_argument("--model.segmentation.use-level5-exp",
                           action="store_true")
        group.add_argument("--model.segmentation.upsample-train-logits",
                           action="store_true",
                           help="Upsample logits to input resolution during "
                                "TRAINING forward too (the reference's "
                                "base_seg_head.py behavior). Default off: the "
                                "loss fuses resize+CE (ops/seg_ce.py) so the "
                                "full-res logits never materialize; eval is "
                                "always full-res either way.")
        return parser

    @property
    def n_seg_classes(self) -> int:
        return getattr(self.opts, "model.segmentation.n_classes", 21)

    def get_lr_multipliers(self, opts):
        """Separate encoder/decoder LR groups (reference enc_dec.py:47-94)."""
        mult = getattr(opts, "model.segmentation.lr_multiplier", 1.0)
        if mult == 1.0:
            return {}
        return {r"seg_head": mult}
