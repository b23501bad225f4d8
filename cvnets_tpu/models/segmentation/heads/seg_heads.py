"""Segmentation heads (parity: reference cvnets/models/segmentation/heads/*:480LoC):
DeepLabv3 (ASPP on out_l5), PSPNet, and a simple 1×1 head; each with optional aux
branch on out_l4 (reference base_seg_head aux logic)."""

from __future__ import annotations

import argparse
from typing import Any, Dict, Union

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.base_model import BaseAnyNNModel
from cvnets_tpu.modules.aspp_block import ASPP
from cvnets_tpu.modules.pspnet_module import PSP


class BaseSegHead(BaseAnyNNModel):
    opts: Any = None

    @property
    def n_seg_classes(self) -> int:
        return getattr(self.opts, "model.segmentation.n_classes", 21)

    @property
    def use_aux_head(self) -> bool:
        return getattr(self.opts, "model.segmentation.use_aux_head", False)

    def _aux_logits(self, end_points: Dict, training: bool) -> jnp.ndarray:
        x = end_points["out_l4"]
        aux_dropout = getattr(self.opts, "model.segmentation.aux_dropout", 0.1)
        x = ConvLayer2d(opts=self.opts, out_channels=x.shape[-1] // 2 or 128,
                        kernel_size=3, use_norm=True, use_act=True,
                        name="aux_conv")(x, training=training)
        if aux_dropout > 0:
            x = nn.Dropout(rate=aux_dropout, deterministic=not training)(x)
        return ConvLayer2d(opts=self.opts, out_channels=self.n_seg_classes,
                           kernel_size=1, use_norm=False, use_act=False, bias=True,
                           name="aux_classifier")(x, training=training)

    def _classify(self, x: jnp.ndarray, training: bool) -> jnp.ndarray:
        dropout = getattr(self.opts, "model.segmentation.classifier_dropout", 0.1)
        if dropout > 0:
            x = nn.Dropout(rate=dropout, deterministic=not training)(x)
        return ConvLayer2d(opts=self.opts, out_channels=self.n_seg_classes,
                           kernel_size=1, use_norm=False, use_act=False, bias=True,
                           name="classifier")(x, training=training)

    def _package(self, logits, end_points, training):
        if self.use_aux_head:
            # aux branch params must exist in both train and eval traces; the
            # aux output is only *used* during training (reference aux logic)
            aux = self._aux_logits(end_points, training)
            if training:
                return {"segmentation_output": logits, "aux_output": aux}
        return logits


MODEL_REGISTRY.register(name="__base__", type="segmentation_head")(BaseSegHead)


@MODEL_REGISTRY.register(name="deeplabv3", type="segmentation_head")
class DeeplabV3(BaseSegHead):
    """ASPP on out_l5 (reference heads/deeplabv3.py:20-125)."""

    opts: Any = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.segmentation.deeplabv3.aspp-rates", type=int,
                           nargs="+", default=[6, 12, 18])
        group.add_argument("--model.segmentation.deeplabv3.aspp-out-channels",
                           type=int, default=256)
        group.add_argument("--model.segmentation.deeplabv3.aspp-sep-conv",
                           action="store_true")
        group.add_argument("--model.segmentation.deeplabv3.aspp-dropout",
                           type=float, default=0.1)
        return parser

    @nn.compact
    def __call__(self, end_points: Dict, training: bool = False
                 ) -> Union[jnp.ndarray, Dict]:
        opts = self.opts
        x = end_points.get("out_l5_exp", end_points["out_l5"])
        x = ASPP(
            opts=opts,
            out_channels=getattr(opts, "model.segmentation.deeplabv3.aspp_out_channels",
                                 256),
            atrous_rates=tuple(getattr(opts, "model.segmentation.deeplabv3.aspp_rates",
                                       [6, 12, 18])),
            is_sep_conv=getattr(opts, "model.segmentation.deeplabv3.aspp_sep_conv",
                                False),
            dropout=getattr(opts, "model.segmentation.deeplabv3.aspp_dropout", 0.1),
            name="aspp",
        )(x, training=training)
        logits = self._classify(x, training)
        return self._package(logits, end_points, training)


@MODEL_REGISTRY.register(name="pspnet", type="segmentation_head")
class PSPNet(BaseSegHead):
    """PSP module on out_l5 (reference heads/pspnet.py:19)."""

    opts: Any = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.segmentation.pspnet.psp-pool-sizes", type=int,
                           nargs="+", default=[1, 2, 3, 6])
        group.add_argument("--model.segmentation.pspnet.psp-out-channels", type=int,
                           default=512)
        group.add_argument("--model.segmentation.pspnet.psp-dropout", type=float,
                           default=0.1)
        return parser

    @nn.compact
    def __call__(self, end_points: Dict, training: bool = False
                 ) -> Union[jnp.ndarray, Dict]:
        opts = self.opts
        x = end_points.get("out_l5_exp", end_points["out_l5"])
        x = PSP(
            opts=opts,
            out_channels=getattr(opts, "model.segmentation.pspnet.psp_out_channels",
                                 512),
            pool_sizes=tuple(getattr(opts, "model.segmentation.pspnet.psp_pool_sizes",
                                     [1, 2, 3, 6])),
            dropout=getattr(opts, "model.segmentation.pspnet.psp_dropout", 0.1),
            name="psp",
        )(x, training=training)
        logits = self._classify(x, training)
        return self._package(logits, end_points, training)


@MODEL_REGISTRY.register(name="simple_seg_head", type="segmentation_head")
class SimpleSegHead(BaseSegHead):
    """3×3 conv + classifier (reference heads/simple_seg_head.py)."""

    opts: Any = None

    @nn.compact
    def __call__(self, end_points: Dict, training: bool = False
                 ) -> Union[jnp.ndarray, Dict]:
        x = end_points.get("out_l5_exp", end_points["out_l5"])
        x = ConvLayer2d(opts=self.opts, out_channels=x.shape[-1], kernel_size=3,
                        use_norm=True, use_act=True, name="conv")(x,
                                                                  training=training)
        logits = self._classify(x, training)
        return self._package(logits, end_points, training)
