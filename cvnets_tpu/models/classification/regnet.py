"""RegNet X/Y (parity: reference cvnets/models/classification/regnet.py:29).

Layer map: conv_1 = 3×3 s2 stem (32ch); layer_1 is empty (RegNet has 4 stages);
layer_2..layer_5 are the four AnyRegNetStages."""

from __future__ import annotations

import argparse
from typing import Any, Optional

from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.classification.base_image_encoder import (
    BaseImageEncoder,
    Classifier,
)
from cvnets_tpu.models.classification.config.regnet import get_configuration
from cvnets_tpu.modules.regnet_modules import XRegNetBlock


@MODEL_REGISTRY.register(name="regnet", type="classification")
class RegNet(BaseImageEncoder):
    opts: Any = None
    output_stride: Optional[int] = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.classification.regnet.stem-width", type=int,
                           default=32)
        group.add_argument("--model.classification.regnet.mode", type=str,
                           default="y_400mf")
        group.add_argument("--model.classification.regnet.stochastic-depth-prob",
                           type=float, default=0.0)
        return parser

    def setup(self) -> None:
        opts = self.opts
        cfg = get_configuration(opts)
        sd_prob = getattr(opts, "model.classification.regnet.stochastic_depth_prob",
                          0.0) or 0.0

        stem = getattr(opts, "model.classification.regnet.stem_width", 32) or 32
        self.conv_1 = ConvLayer2d(opts=opts, out_channels=stem, kernel_size=3,
                                  stride=2, use_norm=True, use_act=True)
        conf = {"conv1": {"in": 3, "out": stem}}
        self.layer_1 = None
        conf["layer1"] = {"in": stem, "out": stem}

        total = sum(cfg[f"layer{i}"]["depth"] for i in range(1, 5))
        in_ch = stem
        bid = 0
        for li in range(1, 5):
            c = cfg[f"layer{li}"]
            blocks = []
            stage_in = in_ch
            for bi in range(c["depth"]):
                blocks.append(XRegNetBlock(
                    opts=opts, in_channels=in_ch, out_channels=c["width"],
                    stride=c["stride"] if bi == 0 else 1,
                    group_width=c["groups"],
                    bottleneck_multiplier=c["bottleneck_multiplier"],
                    se_ratio=c["se_ratio"],
                    stochastic_depth_prob=sd_prob * bid / max(total - 1, 1),
                ))
                in_ch = c["width"]
                bid += 1
            setattr(self, f"layer_{li + 1}", blocks)
            conf[f"layer{li + 1}"] = {"in": stage_in, "out": in_ch}

        self.conv_1x1_exp = None
        conf["exp_before_cls"] = {"in": in_ch, "out": in_ch}
        self.classifier = Classifier(opts=opts, n_classes=self.n_classes,
                                     dropout=self.classifier_dropout)
        conf["cls"] = {"in": in_ch, "out": self.n_classes}
        self.model_conf_dict = conf
        from cvnets_tpu.models.neural_augmentor.neural_aug import build_neural_augmentor

        self.neural_augmentor = build_neural_augmentor(opts)
