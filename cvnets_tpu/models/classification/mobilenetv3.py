"""MobileNetV3 small/large (parity: reference
cvnets/models/classification/mobilenetv3.py:21 + config/mobilenetv3.py;
arXiv:1905.02244). Uses InvertedResidualSE with hard-swish and SE where the table
says so; stem/exp layers use hard-swish."""

from __future__ import annotations

import argparse
from typing import Any, Dict, List, Optional

from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.classification.base_image_encoder import (
    BaseImageEncoder,
    Classifier,
)
from cvnets_tpu.modules.inverted_residual import InvertedResidualSE
from cvnets_tpu.utils import logger
from cvnets_tpu.utils.math_utils import make_divisible


def get_configuration(opts) -> Dict:
    mode = (getattr(opts, "model.classification.mobilenetv3.mode", "large")
            or "large").lower()
    cfg: Dict[str, List] = {}
    if mode == "small":
        # kernel, expansion, out_channels, use_se, use_hs, stride
        cfg["layer_1"] = [[3, 1, 16, True, False, 2]]
        cfg["layer_2"] = [[3, 4.5, 24, False, False, 2]]
        cfg["layer_3"] = [[3, 3.67, 24, False, False, 1]]
        cfg["layer_4"] = [
            [5, 4, 40, True, True, 2], [5, 6, 40, True, True, 1],
            [5, 6, 40, True, True, 1], [5, 3, 48, True, True, 1],
            [5, 3, 48, True, True, 1],
        ]
        cfg["layer_5"] = [
            [5, 6, 96, True, True, 2], [5, 6, 96, True, True, 1],
            [5, 6, 96, True, True, 1],
        ]
        cfg["last_channels"] = 1024
    elif mode == "large":
        cfg["layer_1"] = [[3, 1, 16, False, False, 1]]
        cfg["layer_2"] = [[3, 4, 24, False, False, 2], [3, 3, 24, False, False, 1]]
        cfg["layer_3"] = [
            [5, 3, 40, True, False, 2], [5, 3, 40, True, False, 1],
            [5, 3, 40, True, False, 1],
        ]
        cfg["layer_4"] = [
            [3, 6, 80, False, True, 2], [3, 2.5, 80, False, True, 1],
            [3, 2.3, 80, False, True, 1], [3, 2.3, 80, False, True, 1],
            [3, 6, 112, True, True, 1], [3, 6, 112, True, True, 1],
        ]
        cfg["layer_5"] = [
            [5, 6, 160, True, True, 2], [5, 6, 160, True, True, 1],
            [5, 6, 160, True, True, 1],
        ]
        cfg["last_channels"] = 1280
    else:
        logger.error(f"MobileNetV3 mode must be small/large; got {mode}")
    return cfg


@MODEL_REGISTRY.register(name="mobilenetv3", type="classification")
class MobileNetV3(BaseImageEncoder):
    opts: Any = None
    output_stride: Optional[int] = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.classification.mobilenetv3.mode", type=str,
                           default="large")
        group.add_argument("--model.classification.mobilenetv3.width-multiplier",
                           type=float, default=1.0)
        return parser

    def setup(self) -> None:
        opts = self.opts
        cfg = get_configuration(opts)
        wm = getattr(opts, "model.classification.mobilenetv3.width_multiplier", 1.0)

        stem = make_divisible(16 * wm, 8)
        self.conv_1 = ConvLayer2d(opts=opts, out_channels=stem, kernel_size=3,
                                  stride=2, use_norm=True, use_act=True,
                                  act_name="hard_swish")
        conf = {"conv1": {"in": 3, "out": stem}}
        in_ch = stem
        dilation = 1
        for li in range(1, 6):
            blocks = []
            stage_in = in_ch
            for bi, (k, exp, out_c, use_se, use_hs, stride) in enumerate(
                cfg[f"layer_{li}"]
            ):
                out_c = make_divisible(out_c * wm, 8)
                if (stride == 2 and self.output_stride is not None
                        and {4: 16, 5: 32}.get(li, 0) > self.output_stride):
                    dilation *= stride
                    stride = 1
                # NOTE: the reference's _make_layer (mobilenetv3.py:192-201)
                # never forwards the config's kernel_size column — every block
                # uses the IRSE default 3x3. Replicated for checkpoint parity.
                blocks.append(InvertedResidualSE(
                    opts=opts, in_channels=in_ch, out_channels=out_c,
                    expand_ratio=exp, use_hs=use_hs, use_se=use_se,
                    stride=stride, kernel_size=3, dilation=dilation,
                ))
                in_ch = out_c
            setattr(self, f"layer_{li}", blocks)
            conf[f"layer{li}"] = {"in": stage_in, "out": in_ch}

        exp_ch = make_divisible(in_ch * 6, 8)
        self.conv_1x1_exp = ConvLayer2d(opts=opts, out_channels=exp_ch, kernel_size=1,
                                        use_norm=True, use_act=True,
                                        act_name="hard_swish")
        conf["exp_before_cls"] = {"in": in_ch, "out": exp_ch}
        last = make_divisible(cfg["last_channels"] * max(1.0, wm), 8)
        self.classifier = MobileNetV3Classifier(
            opts=opts, hidden_dim=last, n_classes=self.n_classes,
            dropout=self.classifier_dropout,
        )
        conf["cls"] = {"in": exp_ch, "out": self.n_classes}
        self.model_conf_dict = conf
        from cvnets_tpu.models.neural_augmentor.neural_aug import build_neural_augmentor

        self.neural_augmentor = build_neural_augmentor(opts)


import flax.linen as nn


class MobileNetV3Classifier(nn.Module):
    """Pool → Linear(hidden) + hard-swish → Dropout → Linear(classes) head
    (reference mobilenetv3.py classifier with `last_channels`)."""

    opts: Any = None
    hidden_dim: int = 1280
    n_classes: int = 1000
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        from cvnets_tpu.layers.activation import build_act_layer
        from cvnets_tpu.layers.dtype_utils import compute_dtype
        from cvnets_tpu.layers.init_utils import linear_init
        from cvnets_tpu.layers.pool import GlobalPool

        from cvnets_tpu.quantization import quant_dense

        pool_type = getattr(self.opts, "model.layer.global_pool", "mean")
        x = GlobalPool(pool_type=pool_type, name="global_pool")(x)
        x = quant_dense(self.opts, training, self.hidden_dim,
                        kernel_init=linear_init(self.opts),
                        dtype=compute_dtype(self.opts), name="fc1")(x)
        x = build_act_layer(self.opts, act_name="hard_swish")(x)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=not training)(x)
        return quant_dense(self.opts, training, self.n_classes,
                           kernel_init=linear_init(self.opts),
                           dtype=compute_dtype(self.opts), name="fc2")(x)
