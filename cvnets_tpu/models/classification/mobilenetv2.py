"""MobileNetV2 (parity: reference cvnets/models/classification/mobilenetv2.py:20).

5-stage skeleton: conv_1 (3×3 s2) → layer_1..layer_5 (inverted residual stacks;
layer_4 = table rows layer4+layer4_a, layer_5 = layer5+layer5_a) → conv_1x1_exp →
classifier. Supports width multiplier and output-stride dilation for segmentation.
"""

from __future__ import annotations

import argparse
from typing import Any, Optional

import flax.linen as nn

from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.classification.base_image_encoder import (
    BaseImageEncoder,
    Classifier,
)
from cvnets_tpu.models.classification.config.mobilenetv2 import get_configuration
from cvnets_tpu.modules.inverted_residual import InvertedResidual
from cvnets_tpu.utils.math_utils import make_divisible


@MODEL_REGISTRY.register(name="mobilenetv2", type="classification")
class MobileNetV2(BaseImageEncoder):
    opts: Any = None
    output_stride: Optional[int] = None  # 8/16 dilates layer_4/5 for segmentation

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument(
            "--model.classification.mobilenetv2.width-multiplier",
            type=float, default=1.0,
        )
        return parser

    def setup(self) -> None:
        opts = self.opts
        wm = getattr(opts, "model.classification.mobilenetv2.width_multiplier", 1.0)
        cfg = get_configuration(opts)

        # the reference does NOT width-scale the stem: conv_1 is 32 channels at
        # every multiplier (reference mobilenetv2.py:35 ``input_channels = 32``)
        stem_channels = 32
        self.conv_1 = ConvLayer2d(
            opts=opts, out_channels=stem_channels, kernel_size=3, stride=2,
            use_norm=True, use_act=True,
        )
        conf = {"conv1": {"in": 3, "out": stem_channels}}

        in_ch = stem_channels
        dilation = 1
        stages = {}
        for stage_name, rows in (
            ("layer_1", ["layer1"]),
            ("layer_2", ["layer2"]),
            ("layer_3", ["layer3"]),
            ("layer_4", ["layer4", "layer4_a"]),
            ("layer_5", ["layer5", "layer5_a"]),
        ):
            blocks = []
            stage_in = in_ch
            for row in rows:
                c = cfg[row]
                # float in, round-to-nearest-8 (reference _make_layer passes
                # ``c * width_mult`` unfloored into make_divisible)
                out_ch = make_divisible(c["out_channels"] * wm, 8)
                for i in range(c["num_blocks"]):
                    stride = c["stride"] if i == 0 else 1
                    dilate_now = False
                    if stride == 2 and self.output_stride is not None:
                        # keep resolution: convert stride to dilation past the
                        # requested output stride (reference base encoder :38-47)
                        current_os = {"layer_4": 16, "layer_5": 32}.get(stage_name)
                        if current_os is not None and current_os > self.output_stride:
                            dilate_now = True
                    if dilate_now:
                        dilation *= stride
                        stride = 1
                    blocks.append(
                        InvertedResidual(
                            opts=opts, in_channels=in_ch, out_channels=out_ch,
                            stride=stride, expand_ratio=c["expansion_ratio"],
                            dilation=dilation,
                        )
                    )
                    in_ch = out_ch
            stages[stage_name] = blocks
            conf[stage_name.replace("_", "")] = {"in": stage_in, "out": in_ch}

        self.layer_1 = stages["layer_1"]
        self.layer_2 = stages["layer_2"]
        self.layer_3 = stages["layer_3"]
        self.layer_4 = stages["layer_4"]
        self.layer_5 = stages["layer_5"]

        last_ch = make_divisible(1280 * max(1.0, wm), 8)
        self.conv_1x1_exp = ConvLayer2d(
            opts=opts, out_channels=last_ch, kernel_size=1, use_norm=True, use_act=True,
        )
        conf["exp_before_cls"] = {"in": in_ch, "out": last_ch}
        # reference auto-enables classifier dropout when the flag is 0/None:
        # bound(0, 0.2, round(0.2*wm, 3)) (reference mobilenetv2.py:38-43)
        from cvnets_tpu.utils.math_utils import bound_fn

        cls_dropout = self.classifier_dropout
        if not cls_dropout:
            cls_dropout = bound_fn(0.0, 0.2, round(0.2 * wm, 3))
        self.classifier = Classifier(
            opts=opts, n_classes=self.n_classes, dropout=cls_dropout,
        )
        conf["cls"] = {"in": last_ch, "out": self.n_classes}
        self.model_conf_dict = conf
        from cvnets_tpu.models.neural_augmentor.neural_aug import build_neural_augmentor

        self.neural_augmentor = build_neural_augmentor(opts)
