"""MobileNetV1 (parity: reference cvnets/models/classification/mobilenetv1.py:26 —
depthwise-separable stacks, arXiv:1704.04861)."""

from __future__ import annotations

import argparse
from typing import Any, Optional

from cvnets_tpu.layers.conv_layer import ConvLayer2d, SeparableConv2d
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.classification.base_image_encoder import (
    BaseImageEncoder,
    Classifier,
)
from cvnets_tpu.utils.math_utils import make_divisible


def get_configuration(opts):
    wm = getattr(opts, "model.classification.mobilenetv1.width_multiplier", 1.0)

    def c(ch):
        # ceil-before-divisible matches the reference exactly for fractional
        # products (reference config/mobilenetv1.py:16)
        import math

        return make_divisible(int(math.ceil(ch * wm)), 16)

    return {
        "conv1_out": c(32),
        "layer1": {"out_channels": c(64), "stride": 1, "repeat": 1},
        "layer2": {"out_channels": c(128), "stride": 2, "repeat": 2},
        "layer3": {"out_channels": c(256), "stride": 2, "repeat": 2},
        "layer4": {"out_channels": c(512), "stride": 2, "repeat": 6},
        "layer5": {"out_channels": c(1024), "stride": 2, "repeat": 2},
    }


@MODEL_REGISTRY.register(name="mobilenetv1", type="classification")
class MobileNetV1(BaseImageEncoder):
    opts: Any = None
    output_stride: Optional[int] = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument(
            "--model.classification.mobilenetv1.width-multiplier",
            type=float, default=1.0,
        )
        return parser

    def setup(self) -> None:
        opts = self.opts
        cfg = get_configuration(opts)
        out = cfg["conv1_out"]
        self.conv_1 = ConvLayer2d(opts=opts, out_channels=out, kernel_size=3,
                                  stride=2, use_norm=True, use_act=True)
        conf = {"conv1": {"in": 3, "out": out}}
        in_ch = out
        dilation = 1
        for li in range(1, 6):
            c = cfg[f"layer{li}"]
            blocks = []
            stage_in = in_ch
            for bi in range(c["repeat"]):
                stride = c["stride"] if bi == 0 else 1
                if (stride == 2 and self.output_stride is not None
                        and {4: 16, 5: 32}.get(li, 0) > self.output_stride):
                    dilation *= stride
                    stride = 1
                blocks.append(SeparableConv2d(
                    opts=opts, in_channels=in_ch, out_channels=c["out_channels"],
                    kernel_size=3, stride=stride, dilation=dilation,
                    use_norm=True, use_act=True,
                ))
                in_ch = c["out_channels"]
            setattr(self, f"layer_{li}", blocks)
            conf[f"layer{li}"] = {"in": stage_in, "out": in_ch}

        self.conv_1x1_exp = None
        conf["exp_before_cls"] = {"in": in_ch, "out": in_ch}
        # reference auto-enables classifier dropout when the flag is 0:
        # bound(0, 0.1, round(0.1*wm, 3)) (reference mobilenetv1.py:36-44)
        from cvnets_tpu.utils.math_utils import bound_fn

        wm = getattr(opts, "model.classification.mobilenetv1.width_multiplier", 1.0)
        cls_dropout = self.classifier_dropout
        if not cls_dropout:
            cls_dropout = bound_fn(0.0, 0.1, round(0.1 * wm, 3))
        self.classifier = Classifier(opts=opts, n_classes=self.n_classes,
                                     dropout=cls_dropout)
        conf["cls"] = {"in": in_ch, "out": self.n_classes}
        self.model_conf_dict = conf
        from cvnets_tpu.models.neural_augmentor.neural_aug import build_neural_augmentor

        self.neural_augmentor = build_neural_augmentor(opts)
