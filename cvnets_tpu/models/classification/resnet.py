"""ResNet (parity: reference cvnets/models/classification/resnet.py:21 — depths
18/34/50/101, SE variants, stochastic depth with linear probability scaling)."""

from __future__ import annotations

import argparse
from typing import Any, Optional

import flax.linen as nn
import numpy as np

from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.classification.base_image_encoder import (
    BaseImageEncoder,
    Classifier,
)
from cvnets_tpu.models.classification.config.resnet import get_configuration
from cvnets_tpu.modules.resnet_modules import (
    BasicResNetBlock,
    BottleneckResNetBlock,
)


@MODEL_REGISTRY.register(name="resnet", type="classification")
class ResNet(BaseImageEncoder):
    opts: Any = None
    output_stride: Optional[int] = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.classification.resnet.depth", type=int, default=50)
        group.add_argument("--model.classification.resnet.stochastic-depth-prob",
                           type=float, default=0.0)
        group.add_argument("--model.classification.resnet.se-resnet",
                           action="store_true", default=False)
        group.add_argument("--model.classification.resnet.dropout", type=float,
                           default=0.0,
                           help="per-block dropout (reference resnet.py:248)")
        return parser

    def setup(self) -> None:
        opts = self.opts
        cfg = get_configuration(opts)
        sd_prob = getattr(opts, "model.classification.resnet.stochastic_depth_prob",
                          0.0) or 0.0
        block_dropout = getattr(opts, "model.classification.resnet.dropout", 0.0) or 0.0

        # reference resnet.py:27-28 — CVNets' ResNet replaces the classic 7x7
        # stem with a 3x3 strided conv, and MaxPool with a 3x3 strided
        # depthwise conv (both norm+act)
        self.conv_1 = ConvLayer2d(opts=opts, out_channels=64, kernel_size=3, stride=2,
                                  use_norm=True, use_act=True)
        conf = {"conv1": {"in": 3, "out": 64}}
        self.layer_1 = ConvLayer2d(opts=opts, out_channels=64, kernel_size=3, stride=2,
                                   groups=64, use_norm=True, use_act=True)
        conf["layer1"] = {"in": 64, "out": 64}

        total_blocks = sum(cfg[f"layer{i}"]["num_blocks"] for i in range(2, 6))
        expansion = {"basic": 1, "bottleneck": 4}
        in_ch = 64
        dilation = 1
        block_idx = 0
        for li in range(2, 6):
            c = cfg[f"layer{li}"]
            block_cls = (BasicResNetBlock if c["block_type"] == "basic"
                         else BottleneckResNetBlock)
            out_ch = c["mid_channels"] * expansion[c["block_type"]]
            stride = c["stride"]
            dilate = False
            if self.output_stride is not None and stride == 2:
                current_os = {4: 16, 5: 32}.get(li)
                if current_os is not None and current_os > self.output_stride:
                    dilate = True
            blocks = []
            stage_in = in_ch
            for bi in range(c["num_blocks"]):
                s = stride if bi == 0 else 1
                if dilate and bi == 0:
                    dilation *= s
                    s = 1
                # linear stochastic-depth schedule over all blocks
                p = sd_prob * block_idx / max(total_blocks - 1, 1)
                blocks.append(block_cls(
                    opts=opts, in_channels=in_ch, mid_channels=c["mid_channels"],
                    out_channels=out_ch, stride=s, dilation=dilation,
                    squeeze_channels=c.get("squeeze_channels"),
                    stochastic_depth_prob=p, dropout=block_dropout,
                ))
                in_ch = out_ch
                block_idx += 1
            setattr(self, f"layer_{li}", blocks)
            conf[f"layer{li}"] = {"in": stage_in, "out": in_ch}

        self.conv_1x1_exp = None
        conf["exp_before_cls"] = {"in": in_ch, "out": in_ch}
        self.classifier = Classifier(opts=opts, n_classes=self.n_classes,
                                     dropout=self.classifier_dropout)
        conf["cls"] = {"in": in_ch, "out": self.n_classes}
        self.model_conf_dict = conf
        from cvnets_tpu.models.neural_augmentor.neural_aug import build_neural_augmentor

        self.neural_augmentor = build_neural_augmentor(opts)
