"""MobileViTv1 (parity: reference cvnets/models/classification/mobilevit.py:20)."""

from __future__ import annotations

import argparse
from typing import Any, Dict, List, Optional, Tuple

from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.classification.base_image_encoder import (
    BaseImageEncoder,
    Classifier,
)
from cvnets_tpu.models.classification.config.mobilevit import get_configuration
from cvnets_tpu.modules.inverted_residual import InvertedResidual
from cvnets_tpu.modules.mobilevit_block import MobileViTBlock
from cvnets_tpu.utils.math_utils import make_divisible


@MODEL_REGISTRY.register(name="mobilevit", type="classification")
class MobileViT(BaseImageEncoder):
    opts: Any = None
    output_stride: Optional[int] = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.classification.mit.mode", type=str,
                           default="small")
        group.add_argument("--model.classification.mit.attn-dropout", type=float,
                           default=0.0)
        group.add_argument("--model.classification.mit.ffn-dropout", type=float,
                           default=0.0)
        group.add_argument("--model.classification.mit.dropout", type=float,
                           default=0.0)
        group.add_argument("--model.classification.mit.transformer-norm-layer",
                           type=str, default="layer_norm")
        group.add_argument("--model.classification.mit.no-fuse-local-global-features",
                           action="store_true", default=False)
        group.add_argument("--model.classification.mit.conv-kernel-size", type=int,
                           default=3)
        group.add_argument("--model.classification.mit.head-dim", type=int,
                           default=None)
        group.add_argument("--model.classification.mit.number-heads", type=int,
                           default=None)
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

        head_dim = cfg.get("head_dim")
        if head_dim is None:
            num_heads = cfg.get("num_heads", 4) or 4
            head_dim = cfg["transformer_channels"] // num_heads
        blocks.append(MobileViTBlock(
            opts=opts, in_channels=in_ch,
            transformer_dim=cfg["transformer_channels"], ffn_dim=cfg["ffn_dim"],
            n_transformer_blocks=cfg.get("transformer_blocks", 1),
            head_dim=head_dim,
            patch_h=cfg.get("patch_h", 2), patch_w=cfg.get("patch_w", 2),
            dropout=getattr(opts, "model.classification.mit.dropout", 0.0),
            ffn_dropout=getattr(opts, "model.classification.mit.ffn_dropout", 0.0),
            attn_dropout=getattr(opts, "model.classification.mit.attn_dropout", 0.0),
            conv_ksize=getattr(opts, "model.classification.mit.conv_kernel_size", 3),
            no_fusion=getattr(
                opts, "model.classification.mit.no_fuse_local_global_features", False),
            transformer_norm_layer=getattr(
                opts, "model.classification.mit.transformer_norm_layer", "layer_norm"),
            dilation=dilation,
        ))
        return blocks, in_ch, dilation

    def setup(self) -> None:
        opts = self.opts
        cfg = get_configuration(opts)
        image_channels = 16
        self.conv_1 = ConvLayer2d(opts=opts, out_channels=image_channels,
                                  kernel_size=3, stride=2, use_norm=True, use_act=True)
        conf = {"conv1": {"in": 3, "out": image_channels}}

        dilate_l4 = dilate_l5 = False
        if self.output_stride == 8:
            dilate_l4 = dilate_l5 = True
        elif self.output_stride == 16:
            dilate_l5 = True

        in_ch = image_channels
        dilation = 1
        for idx, (name, dilate) in enumerate((
            ("layer1", False), ("layer2", False), ("layer3", False),
            ("layer4", dilate_l4), ("layer5", dilate_l5),
        ), start=1):
            stage_in = in_ch
            blocks, in_ch, dilation = self._make_stage(cfg[name], in_ch, dilation,
                                                       dilate)
            setattr(self, f"layer_{idx}", blocks)
            conf[name] = {"in": stage_in, "out": in_ch}

        exp_ch = min(cfg.get("last_layer_exp_factor", 4) * in_ch, 960)
        self.conv_1x1_exp = ConvLayer2d(opts=opts, out_channels=exp_ch,
                                        kernel_size=1, use_norm=True, use_act=True)
        conf["exp_before_cls"] = {"in": in_ch, "out": exp_ch}
        self.classifier = Classifier(opts=opts, n_classes=self.n_classes,
                                     dropout=self.classifier_dropout)
        conf["cls"] = {"in": exp_ch, "out": self.n_classes}
        self.model_conf_dict = conf
        from cvnets_tpu.models.neural_augmentor.neural_aug import build_neural_augmentor

        self.neural_augmentor = build_neural_augmentor(opts)
