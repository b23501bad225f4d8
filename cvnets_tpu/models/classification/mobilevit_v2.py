"""MobileViTv2 (parity: reference cvnets/models/classification/mobilevit_v2.py:20) —
the benchmark/flagship model: MV2 stages + MobileViTBlockv2 separable-attention
stages, classifier = GlobalPool + Linear (no conv_1x1_exp)."""

from __future__ import annotations

import argparse
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn

from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.classification.base_image_encoder import (
    BaseImageEncoder,
    Classifier,
)
from cvnets_tpu.models.classification.config.mobilevit_v2 import get_configuration
from cvnets_tpu.modules.inverted_residual import InvertedResidual
from cvnets_tpu.modules.mobilevit_block import MobileViTBlockv2


@MODEL_REGISTRY.register(name="mobilevit_v2", type="classification")
class MobileViTv2(BaseImageEncoder):
    opts: Any = None
    output_stride: Optional[int] = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.classification.mitv2.attn-dropout", type=float,
                           default=0.0)
        group.add_argument("--model.classification.mitv2.ffn-dropout", type=float,
                           default=0.0)
        group.add_argument("--model.classification.mitv2.dropout", type=float,
                           default=0.0)
        group.add_argument("--model.classification.mitv2.width-multiplier",
                           type=float, default=1.0)
        group.add_argument("--model.classification.mitv2.attn-norm-layer", type=str,
                           default="layer_norm_2d")
        return parser

    def _make_stage(self, cfg: Dict, in_ch: int, dilation: int,
                    dilate: bool) -> Tuple[List, int, int]:
        opts = self.opts
        blocks = []
        if cfg.get("block_type", "mobilevit") != "mobilevit":
            out_ch = cfg["out_channels"]
            for i in range(cfg.get("num_blocks", 2)):
                stride = cfg.get("stride", 1) if i == 0 else 1
                blocks.append(InvertedResidual(
                    opts=opts, in_channels=in_ch, out_channels=out_ch,
                    stride=stride, expand_ratio=cfg.get("expand_ratio", 4),
                ))
                in_ch = out_ch
            return blocks, in_ch, dilation

        stride = cfg.get("stride", 1)
        prev_dilation = dilation
        if stride == 2:
            if dilate:
                dilation *= 2
                stride = 1
            blocks.append(InvertedResidual(
                opts=opts, in_channels=in_ch, out_channels=cfg["out_channels"],
                stride=stride, expand_ratio=cfg.get("mv_expand_ratio", 4),
                dilation=prev_dilation,
            ))
            in_ch = cfg["out_channels"]
        blocks.append(MobileViTBlockv2(
            opts=opts, in_channels=in_ch, attn_unit_dim=cfg["attn_unit_dim"],
            ffn_multiplier=cfg.get("ffn_multiplier", 2.0),
            n_attn_blocks=cfg.get("attn_blocks", 1),
            patch_h=cfg.get("patch_h", 2), patch_w=cfg.get("patch_w", 2),
            dropout=getattr(opts, "model.classification.mitv2.dropout", 0.0),
            ffn_dropout=getattr(opts, "model.classification.mitv2.ffn_dropout", 0.0),
            attn_dropout=getattr(opts, "model.classification.mitv2.attn_dropout", 0.0),
            conv_ksize=3,
            attn_norm_layer=getattr(opts, "model.classification.mitv2.attn_norm_layer",
                                    "layer_norm_2d"),
            dilation=dilation,
        ))
        return blocks, in_ch, dilation

    def setup(self) -> None:
        opts = self.opts
        cfg = get_configuration(opts)
        out_ch = cfg["layer0"]["out_channels"]
        self.conv_1 = ConvLayer2d(opts=opts, out_channels=out_ch, kernel_size=3,
                                  stride=2, use_norm=True, use_act=True)
        conf = {"conv1": {"in": 3, "out": out_ch}}

        dilate_l4 = dilate_l5 = False
        if self.output_stride == 8:
            dilate_l4 = dilate_l5 = True
        elif self.output_stride == 16:
            dilate_l5 = True

        in_ch = out_ch
        dilation = 1
        for idx, (name, dilate) in enumerate((
            ("layer1", False), ("layer2", False), ("layer3", False),
            ("layer4", dilate_l4), ("layer5", dilate_l5),
        ), start=1):
            stage_in = in_ch
            blocks, in_ch, dilation = self._make_stage(cfg[name], in_ch, dilation, dilate)
            setattr(self, f"layer_{idx}", blocks)
            conf[name] = {"in": stage_in, "out": in_ch}

        self.conv_1x1_exp = None
        conf["exp_before_cls"] = {"in": in_ch, "out": in_ch}
        self.classifier = Classifier(
            opts=opts, n_classes=self.n_classes, dropout=self.classifier_dropout,
        )
        conf["cls"] = {"in": in_ch, "out": self.n_classes}
        self.model_conf_dict = conf
        from cvnets_tpu.models.neural_augmentor.neural_aug import build_neural_augmentor

        self.neural_augmentor = build_neural_augmentor(opts)
