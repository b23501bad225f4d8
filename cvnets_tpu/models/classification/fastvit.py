"""FastViT T8-MA36 (parity: reference cvnets/models/classification/fastvit.py:101 +
config/fastvit.py; arXiv:2303.14189)."""

from __future__ import annotations

import argparse
from typing import Any, Optional

from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.classification.base_image_encoder import (
    BaseImageEncoder,
    Classifier,
)
from cvnets_tpu.modules.fastvit import (
    AttentionBlock,
    PatchEmbed,
    RepCPE,
    RepMixerBlock,
)
from cvnets_tpu.modules.mobileone_block import MobileOneBlock
from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.utils import logger

# layers, embed_dims, mlp_ratios, token_mixers (last stage), use_cpe
_VARIANTS = {
    "T8": ([2, 2, 4, 2], [48, 96, 192, 384], 3, "repmixer", False),
    "T12": ([2, 2, 6, 2], [64, 128, 256, 512], 3, "repmixer", False),
    "S12": ([2, 2, 6, 2], [64, 128, 256, 512], 4, "repmixer", False),
    "SA12": ([2, 2, 6, 2], [64, 128, 256, 512], 4, "attention", True),
    "SA24": ([4, 4, 12, 4], [64, 128, 256, 512], 4, "attention", True),
    "SA36": ([6, 6, 18, 6], [64, 128, 256, 512], 4, "attention", True),
    "MA36": ([6, 6, 18, 6], [76, 152, 304, 608], 4, "attention", True),
}


def get_configuration(opts):
    variant = getattr(opts, "model.classification.fastvit.variant", "T8") or "T8"
    if variant not in _VARIANTS:
        logger.error(f"Unsupported FastViT variant {variant}")
    layers, dims, mlp, last_mixer, use_cpe = _VARIANTS[variant]
    return {
        "layers": layers, "embed_dims": dims, "mlp_ratios": [mlp] * 4,
        "token_mixers": ["repmixer"] * 3 + [last_mixer], "use_cpe": use_cpe,
        "down_patch_size": 7, "down_stride": 2, "cls_ratio": 2.0,
        "repmixer_kernel_size": 3,
    }


@MODEL_REGISTRY.register(name="fastvit", type="classification")
class FastViT(BaseImageEncoder):
    opts: Any = None
    output_stride: Optional[int] = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.classification.fastvit.drop-path", type=float,
                           default=0.0)
        group.add_argument("--model.classification.fastvit.use-layer-scale",
                           action="store_true", default=True)
        group.add_argument("--model.classification.fastvit.layer-scale-init-value",
                           type=float, default=1e-5)
        group.add_argument("--model.classification.fastvit.variant", type=str,
                           default="T8")
        group.add_argument("--model.classification.fastvit.dropout", type=float,
                           default=0.0)
        group.add_argument("--model.classification.fastvit.stochastic-depth-prob",
                           type=float, default=0.0)
        group.add_argument("--model.classification.fastvit.inference-mode",
                           action="store_true", default=False)
        return parser

    def setup(self) -> None:
        opts = self.opts
        cfg = get_configuration(opts)
        inference_mode = getattr(
            opts, "model.classification.fastvit.inference_mode", False)
        # reference fastvit.py:135 names the rate `drop_path`; accept it as
        # the primary spelling with stochastic_depth_prob as our alias
        sd_prob = getattr(
            opts, "model.classification.fastvit.drop_path", None)
        if sd_prob is None:
            sd_prob = getattr(
                opts, "model.classification.fastvit.stochastic_depth_prob", 0.0)
        sd_prob = sd_prob or 0.0
        dropout = getattr(opts, "model.classification.fastvit.dropout", 0.0) or 0.0
        dims = cfg["embed_dims"]
        layers = cfg["layers"]
        total = sum(layers)

        # convolutional stem: 3 MobileOne blocks (s2, s2 dw, 1x1)
        self.conv_1 = [
            MobileOneBlock(opts=opts, in_channels=3, out_channels=dims[0],
                           kernel_size=3, stride=2, num_conv_branches=1,
                           inference_mode=inference_mode),
            MobileOneBlock(opts=opts, in_channels=dims[0], out_channels=dims[0],
                           kernel_size=3, stride=2, groups=dims[0],
                           num_conv_branches=1, inference_mode=inference_mode),
            MobileOneBlock(opts=opts, in_channels=dims[0], out_channels=dims[0],
                           kernel_size=1, stride=1, num_conv_branches=1,
                           inference_mode=inference_mode),
        ]
        conf = {"conv1": {"in": 3, "out": dims[0]}}
        self.layer_1 = None
        conf["layer1"] = {"in": dims[0], "out": dims[0]}

        bid = 0
        for si in range(4):
            blocks = []
            if si > 0:
                blocks.append(PatchEmbed(
                    opts=opts, in_channels=dims[si - 1], embed_dim=dims[si],
                    patch_size=cfg["down_patch_size"], stride=cfg["down_stride"],
                    inference_mode=inference_mode,
                ))
            if cfg["token_mixers"][si] == "attention" and cfg["use_cpe"]:
                blocks.append(RepCPE(opts=opts, dim=dims[si],
                                     inference_mode=inference_mode))
            for bi in range(layers[si]):
                p = sd_prob * bid / max(total - 1, 1)
                use_ls = getattr(
                    opts, "model.classification.fastvit.use_layer_scale", True)
                ls_init = getattr(
                    opts,
                    "model.classification.fastvit.layer_scale_init_value", 1e-5)
                if cfg["token_mixers"][si] == "repmixer":
                    blocks.append(RepMixerBlock(
                        opts=opts, dim=dims[si],
                        kernel_size=cfg["repmixer_kernel_size"],
                        mlp_ratio=cfg["mlp_ratios"][si], dropout=dropout,
                        stochastic_depth_prob=p, use_layer_scale=use_ls,
                        layer_scale_init_value=ls_init,
                        inference_mode=inference_mode,
                    ))
                else:
                    blocks.append(AttentionBlock(
                        opts=opts, dim=dims[si], mlp_ratio=cfg["mlp_ratios"][si],
                        num_heads=max(1, dims[si] // 32), dropout=dropout,
                        stochastic_depth_prob=p, use_layer_scale=use_ls,
                        layer_scale_init_value=ls_init,
                    ))
                bid += 1
            setattr(self, f"layer_{si + 2}", blocks)
            conf[f"layer{si + 2}"] = {
                "in": dims[max(0, si - 1)] if si else dims[0], "out": dims[si]
            }

        exp_ch = int(dims[-1] * cfg["cls_ratio"])
        # reference fastvit.py:205-221: ONE grouped MobileOne block expanding
        # dims[-1] -> cls_ratio*dims[-1] (groups=dims[-1]), with SE
        self.conv_1x1_exp = [
            MobileOneBlock(opts=opts, in_channels=dims[-1], out_channels=exp_ch,
                           kernel_size=3, stride=1, groups=dims[-1], use_se=True,
                           num_conv_branches=1, inference_mode=inference_mode),
        ]
        conf["exp_before_cls"] = {"in": dims[-1], "out": exp_ch}
        self.classifier = Classifier(opts=opts, n_classes=self.n_classes,
                                     dropout=self.classifier_dropout)
        conf["cls"] = {"in": exp_ch, "out": self.n_classes}
        self.model_conf_dict = conf
        from cvnets_tpu.models.neural_augmentor.neural_aug import build_neural_augmentor

        self.neural_augmentor = build_neural_augmentor(opts)
