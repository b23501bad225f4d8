"""Base detection model (parity: reference
cvnets/models/detection/base_detection.py:18-143): wraps any registered
classification encoder; heads read the encoder's ``extract_end_points_all`` taps.
On flax the channel bookkeeping (reference model_conf_dict reads :36-50) is
unnecessary — submodules infer input channels at init."""

from __future__ import annotations

import argparse
from typing import Any, Optional

from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.base_model import BaseAnyNNModel


@MODEL_REGISTRY.register(name="__base__", type="detection")
class BaseDetection(BaseAnyNNModel):
    opts: Any = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BaseDetection:
            return parser
        group = parser.add_argument_group(title="Detection models (common)")
        group.add_argument("--model.detection.name", type=str, default=None)
        group.add_argument("--model.detection.n-classes", type=int, default=80)
        group.add_argument("--model.detection.pretrained", type=str, default=None)
        group.add_argument("--model.detection.output-stride", type=int, default=None)
        group.add_argument("--model.detection.replace-stride-with-dilation",
                           action="store_true", default=False)
        group.add_argument("--model.detection.freeze-batch-norm",
                           action="store_true", default=False)
        group.add_argument("--evaluation.detection.mode", type=str,
                           default="validation_set",
                           choices=["single_image", "image_folder",
                                    "validation_set"])
        group.add_argument("--evaluation.detection.path", type=str, default=None)
        group.add_argument("--evaluation.detection.num-classes-in-dataset",
                           type=int, default=None)
        group.add_argument("--evaluation.detection.num-classes", type=int,
                           default=None,
                           help="Config-compat (reference eval_detection): "
                                "detection class count for offline eval")
        group.add_argument("--evaluation.detection.resize-input-images",
                           action="store_true", default=False)
        group.add_argument("--evaluation.detection.save-overlay-boxes",
                           action="store_true")
        return parser

    @staticmethod
    def build_encoder(opts, output_stride: Optional[int] = None):
        """Build the classification backbone named by model.classification.name.

        --model.detection.output-stride dilates the backbone's last stages
        (reference base_detection.py:109)."""
        from cvnets_tpu.models import get_model

        if output_stride is None:
            output_stride = getattr(opts, "model.detection.output_stride", None)
        kwargs = {}
        if output_stride in (8, 16):
            kwargs["output_stride"] = output_stride
        return get_model(opts, category="classification", **kwargs)

    @property
    def n_detection_classes(self) -> int:
        return getattr(self.opts, "model.detection.n_classes", 80)
