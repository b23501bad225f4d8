"""MobileOne s0-s4 (parity: reference cvnets/models/classification/mobileone.py:18 +
config/mobileone.py; arXiv:2206.04040). Each stage alternates depthwise + pointwise
MobileOne blocks; reparameterizes for inference via
utils/reparam_utils.get_exportable_params."""

from __future__ import annotations

import argparse
from typing import Any, Optional

from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.classification.base_image_encoder import (
    BaseImageEncoder,
    Classifier,
)
from cvnets_tpu.modules.mobileone_block import MobileOneBlock
from cvnets_tpu.utils import logger

_VARIANTS = {
    "s0": ([2, 8, 10, 1], (0.75, 1.0, 1.0, 2.0), 4, False),
    "s1": ([2, 8, 10, 1], (1.5, 1.5, 2.0, 2.5), 1, False),
    "s2": ([2, 8, 10, 1], (1.5, 2.0, 2.5, 4.0), 1, False),
    "s3": ([2, 8, 10, 1], (2.0, 2.5, 3.0, 4.0), 1, False),
    "s4": ([2, 8, 10, 1], (3.0, 3.5, 3.5, 4.0), 1, True),
}


def get_configuration(opts):
    variant = getattr(opts, "model.classification.mobileone.variant", "s1") or "s1"
    if variant not in _VARIANTS:
        logger.error(f"Unsupported MobileOne variant {variant}")
    blocks, widths, branches, use_se = _VARIANTS[variant]
    return {"num_blocks_per_stage": blocks, "width_multipliers": widths,
            "num_conv_branches": branches, "use_se": use_se}


@MODEL_REGISTRY.register(name="mobileone", type="classification")
class MobileOne(BaseImageEncoder):
    opts: Any = None
    output_stride: Optional[int] = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.classification.mobileone.variant", type=str,
                           default="s1")
        group.add_argument("--model.classification.mobileone.inference-mode",
                           action="store_true", default=False,
                           help="Build the reparameterized (merged-branch) model")
        return parser

    def setup(self) -> None:
        opts = self.opts
        cfg = get_configuration(opts)
        inference_mode = getattr(
            opts, "model.classification.mobileone.inference_mode", False)
        n_branches = cfg["num_conv_branches"]
        widths = cfg["width_multipliers"]
        nblocks = cfg["num_blocks_per_stage"]
        use_se = cfg["use_se"]

        in_planes = min(64, int(64 * widths[0]))
        self.conv_1 = MobileOneBlock(
            opts=opts, in_channels=3, out_channels=in_planes, kernel_size=3,
            stride=2, inference_mode=inference_mode, num_conv_branches=1,
        )
        conf = {"conv1": {"in": 3, "out": in_planes}}
        self.layer_1 = None
        conf["layer1"] = {"in": in_planes, "out": in_planes}

        stage_planes = [int(64 * widths[0]), int(128 * widths[1]),
                        int(256 * widths[2]), int(512 * widths[3])]
        stage_se = [0, 0, nblocks[2] // 2 if use_se else 0,
                    nblocks[3] if use_se else 0]
        in_ch = in_planes
        for si in range(4):
            planes, num_blocks, n_se = stage_planes[si], nblocks[si], stage_se[si]
            blocks = []
            stage_in = in_ch
            for bi in range(num_blocks):
                stride = 2 if bi == 0 else 1
                block_se = bi >= (num_blocks - n_se)
                # depthwise
                blocks.append(MobileOneBlock(
                    opts=opts, in_channels=in_ch, out_channels=in_ch, kernel_size=3,
                    stride=stride, groups=in_ch, use_se=block_se,
                    num_conv_branches=n_branches, inference_mode=inference_mode,
                ))
                # pointwise
                blocks.append(MobileOneBlock(
                    opts=opts, in_channels=in_ch, out_channels=planes, kernel_size=1,
                    stride=1, use_se=block_se, num_conv_branches=n_branches,
                    inference_mode=inference_mode,
                ))
                in_ch = planes
            setattr(self, f"layer_{si + 2}", blocks)
            conf[f"layer{si + 2}"] = {"in": stage_in, "out": in_ch}

        self.conv_1x1_exp = None
        conf["exp_before_cls"] = {"in": in_ch, "out": in_ch}
        self.classifier = Classifier(opts=opts, n_classes=self.n_classes,
                                     dropout=self.classifier_dropout)
        conf["cls"] = {"in": in_ch, "out": self.n_classes}
        self.model_conf_dict = conf
        from cvnets_tpu.models.neural_augmentor.neural_aug import build_neural_augmentor

        self.neural_augmentor = build_neural_augmentor(opts)
