"""Swin Transformer (parity: reference cvnets/models/classification/swin_transformer.py:27
+ config/swin_transformer.py; arXiv:2103.14030). Modes: tiny/small/base/large."""

from __future__ import annotations

import argparse
from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.dtype_utils import compute_dtype
from cvnets_tpu.layers.init_utils import linear_init
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.classification.base_image_encoder import BaseImageEncoder
from cvnets_tpu.modules.swin_transformer_block import (
    PatchMerging,
    SwinTransformerBlock,
)
from cvnets_tpu.utils import logger

# embed_dim, depths, num_heads
_MODES = {
    "tiny": (96, [2, 2, 6, 2], [3, 6, 12, 24]),
    "small": (96, [2, 2, 18, 2], [3, 6, 12, 24]),
    "base": (128, [2, 2, 18, 2], [4, 8, 16, 32]),
    "large": (192, [2, 2, 18, 2], [6, 12, 24, 48]),
}


def get_configuration(opts) -> Dict:
    mode = (getattr(opts, "model.classification.swin.mode", "tiny") or "tiny").lower()
    if mode not in _MODES:
        logger.error(f"Unsupported Swin mode {mode}; choose from {sorted(_MODES)}")
    embed_dim, depths, heads = _MODES[mode]
    return {
        "embed_dim": embed_dim, "depths": depths, "num_heads": heads,
        "window_size": getattr(opts, "model.classification.swin.window_size", 7),
        "mlp_ratio": 4.0,
        "dropout": getattr(opts, "model.classification.swin.dropout", 0.0),
        "attn_dropout": getattr(opts, "model.classification.swin.attn_dropout", 0.0),
        "stochastic_depth_prob": getattr(
            opts, "model.classification.swin.stochastic_depth_prob", 0.2),
        "patch_size": 4,
    }


@MODEL_REGISTRY.register(name="swin", type="classification")
class SwinTransformer(BaseImageEncoder):
    opts: Any = None
    output_stride: Optional[int] = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.classification.swin.mode", type=str, default="tiny")
        group.add_argument("--model.classification.swin.extract-end-point-format",
                           type=str, default="nhwc", choices=["nchw", "nhwc"],
                           help="Config-compat (reference swin_transformer.py:268);"
                                " end points are NHWC on TPU either way")
        group.add_argument("--model.classification.swin.window-size", type=int,
                           default=7)
        group.add_argument("--model.classification.swin.dropout", type=float,
                           default=0.0)
        group.add_argument("--model.classification.swin.attn-dropout", type=float,
                           default=0.0)
        group.add_argument("--model.classification.swin.stochastic-depth-prob",
                           type=float, default=0.2)
        group.add_argument("--model.classification.swin.norm-layer", type=str,
                           default="layer_norm")
        return parser

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        ep = self._forward_stages(x, training)
        return self._classify(ep["out_l5"], training)

    def _classify(self, x, training):
        from cvnets_tpu.quantization import quant_dense

        x = nn.LayerNorm(epsilon=1e-5, name="post_norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        return quant_dense(self.opts, training, self.n_classes,
                           kernel_init=linear_init(self.opts),
                           dtype=compute_dtype(self.opts),
                           name="classifier")(x)

    def _forward_stages(self, x, training) -> Dict[str, jnp.ndarray]:
        opts = self.opts
        # unimplemented semantics must hard-error, not silently train a
        # different model (all Swin norms here are LayerNorm)
        norm_name = getattr(
            opts, "model.classification.swin.norm_layer", "layer_norm")
        if norm_name not in (None, "layer_norm"):
            logger.error(
                f"swin: only layer_norm is supported, got {norm_name}")
        cfg = get_configuration(opts)
        ps = cfg["patch_size"]
        # reference conv_1: bias-free patchify conv with the ConvLayer2d
        # auto-padding quirk ((k-1)//2 = 1 for the 4x4 patch conv), then LN
        pad = (ps - 1) // 2
        x = nn.Conv(cfg["embed_dim"], (ps, ps), strides=(ps, ps),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=compute_dtype(opts), name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False,
                         name="patch_norm")(x)

        out: Dict[str, jnp.ndarray] = {"out_l1": x}
        total = sum(cfg["depths"])
        bid = 0
        dim = cfg["embed_dim"]
        # --model.classification.gradient-checkpointing: per-block remat
        # (reference wraps stages in torch.utils.checkpoint; Swin's blocks
        # don't route through BaseImageEncoder._run_stage, so lift here).
        # ``training`` is passed positionally and marked static.
        block_cls = (nn.remat(SwinTransformerBlock, static_argnums=(2,))
                     if self.gradient_checkpointing and training
                     else SwinTransformerBlock)
        for si, (depth, heads) in enumerate(zip(cfg["depths"], cfg["num_heads"])):
            for bi in range(depth):
                x = block_cls(
                    opts=opts, dim=dim, num_heads=heads,
                    window_size=cfg["window_size"],
                    shift_size=0 if bi % 2 == 0 else cfg["window_size"] // 2,
                    mlp_ratio=cfg["mlp_ratio"], dropout=cfg["dropout"],
                    attn_dropout=cfg["attn_dropout"],
                    stochastic_depth_prob=cfg["stochastic_depth_prob"] * bid
                    / max(total - 1, 1),
                    name=f"stage{si}_block{bi}",
                )(x, training)
                bid += 1
            out[f"out_l{si + 2}"] = x
            if si < len(cfg["depths"]) - 1:
                x = PatchMerging(opts=opts, dim=dim, name=f"merge{si}")(x,
                                                                        training=training)
                dim *= 2
        out["out_l5"] = x
        return out

    def extract_end_points_all(self, x, use_l5: bool = True, use_l5_exp: bool = False,
                               training: bool = False) -> Dict[str, jnp.ndarray]:
        return self._forward_stages(x, training)
