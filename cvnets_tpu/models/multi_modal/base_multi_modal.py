"""Base multi-modal image-text model (parity: reference
cvnets/models/multi_modal_img_text/base_multi_modal_img_text.py:67)."""

from __future__ import annotations

import argparse
from typing import Any

from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.base_model import BaseAnyNNModel


@MODEL_REGISTRY.register(name="__base__", type="multi_modal_image_text")
class BaseMultiModalImageText(BaseAnyNNModel):
    opts: Any = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BaseMultiModalImageText:
            return parser
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.multi-modal-image-text.name", type=str,
                           default=None)
        group.add_argument("--model.multi-modal-image-text.pretrained", type=str,
                           default=None)
        group.add_argument("--model.multi-modal-image-text.lr-multiplier-img-encoder",
                           type=float, default=1.0)
        group.add_argument("--model.multi-modal-image-text.lr-multiplier-text-encoder",
                           type=float, default=1.0)
        return parser
