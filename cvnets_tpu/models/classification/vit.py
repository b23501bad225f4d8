"""Vision Transformer (parity: reference cvnets/models/classification/vit.py:34).

Conv stem (4,2,2 strides = patch 16) → +pos-embed (interpolated for other
resolutions) → optional CLS token → pre-norm transformer stack → final norm →
CLS (or mean) embedding → linear classifier. ``extract_end_points_all`` exposes the
spatial token grid for Mask R-CNN/segmentation (simple-FPN path).

TPU notes: gradient checkpointing wraps each transformer block with ``nn.remat``;
stochastic depth follows the reference's per-layer linear schedule.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.conv_layer import ConvLayer2d, TransposeConvLayer2d
from cvnets_tpu.layers.normalization import get_normalization_layer
from cvnets_tpu.layers.positional_embedding import PositionalEmbedding
from cvnets_tpu.models import MODEL_REGISTRY
from cvnets_tpu.models.classification.base_image_encoder import BaseImageEncoder
from cvnets_tpu.models.classification.config.vit import get_configuration
from cvnets_tpu.modules.transformer import TransformerEncoder


@MODEL_REGISTRY.register(name="vit", type="classification")
class VisionTransformer(BaseImageEncoder):
    opts: Any = None
    output_stride: Optional[int] = None

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--model.classification.vit.mode", type=str, default="base")
        group.add_argument("--model.classification.vit.dropout", type=float, default=0.0)
        group.add_argument("--model.classification.vit.stochastic-dropout",
                           type=float, default=0.0)
        group.add_argument("--model.classification.vit.norm-layer", type=str,
                           default="layer_norm")
        group.add_argument("--model.classification.vit.sinusoidal-pos-emb",
                           action="store_true", default=False)
        group.add_argument("--model.classification.vit.no-cls-token",
                           action="store_true", default=False)
        group.add_argument("--model.classification.vit.use-pytorch-mha",
                           action="store_true", default=False,
                           help="Config-compat; single fused MHA path on TPU")
        group.add_argument("--model.classification.vit.use-simple-fpn",
                           action="store_true", default=False)
        group.add_argument("--model.classification.vit.checkpoint-segments",
                           type=int, default=4)
        group.add_argument(
            "--model.classification.vit.moe-num-experts", type=int, default=0,
            help="0 = dense FFN (reference ViT). >0 swaps every"
            " moe-layer-period-th block's FFN for a sparse MoE"
            " (modules/moe.py); expert weights shard over the mesh's 'model'"
            " axis (expert parallelism).")
        group.add_argument("--model.classification.vit.moe-top-k",
                           type=int, default=2)
        group.add_argument("--model.classification.vit.moe-capacity-factor",
                           type=float, default=1.25)
        group.add_argument(
            "--model.classification.vit.moe-layer-period", type=int, default=2,
            help="Every p-th transformer block is MoE (GShard-style"
            " alternation); 1 = every block.")
        return parser

    def _config(self):
        return get_configuration(self.opts)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False,
                 return_image_embeddings: bool = False) -> Any:
        opts = self.opts
        cfg = self._config()
        embed_dim = cfg["embed_dim"]
        use_cls_token = not getattr(opts, "model.classification.vit.no_cls_token", False)
        sinusoidal = getattr(opts, "model.classification.vit.sinusoidal_pos_emb", False)
        sd_prob = getattr(opts, "model.classification.vit.stochastic_dropout", 0.0) or 0.0

        strides = [4, 2, 2]
        if self.output_stride == 8:
            strides[0] = 2
        conv_stem_dim = max(32, embed_dim // 4)
        # conv stem: 4,2,2 (= patch 16)
        x = ConvLayer2d(opts=opts, out_channels=conv_stem_dim, kernel_size=strides[0],
                        stride=strides[0], bias=False, use_norm=True, use_act=True,
                        name="patch_emb_0")(x, training=training)
        x = ConvLayer2d(opts=opts, out_channels=conv_stem_dim, kernel_size=2,
                        stride=strides[1], bias=False, use_norm=True, use_act=True,
                        name="patch_emb_1")(x, training=training)
        x = ConvLayer2d(opts=opts, out_channels=embed_dim, kernel_size=2,
                        stride=strides[2], bias=True, use_norm=False, use_act=False,
                        name="patch_emb_2")(x, training=training)

        b, n_h, n_w, c = x.shape
        tokens = x.reshape(b, n_h * n_w, c)
        tokens = PositionalEmbedding(
            num_embeddings=(224 // 16) ** 2, embedding_dim=embed_dim,
            is_learnable=not sinusoidal, name="pos_embed",
        )(tokens)
        if use_cls_token:
            cls_token = self.param(
                "cls_token", nn.initializers.truncated_normal(stddev=0.02),
                (1, 1, embed_dim),
            )
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls_token, (b, 1, embed_dim)).astype(tokens.dtype),
                 tokens], axis=1,
            )
        if cfg["pos_emb_drop_p"] > 0:
            tokens = nn.Dropout(rate=cfg["pos_emb_drop_p"],
                                deterministic=not training)(tokens)

        n_layers = cfg["n_transformer_layers"]
        block_cls = TransformerEncoder
        # checkpoint_segments (reference vit.py:471-475) is consulted ONLY
        # when gradient-checkpointing is enabled; per-block remat is the
        # math-identical, strictly-lower-memory XLA form of its
        # checkpoint_sequential-over-N-segments (so the segment count itself
        # has no XLA analog beyond being >=1)
        moe_experts = getattr(
            opts, "model.classification.vit.moe_num_experts", 0) or 0
        moe_period = max(getattr(
            opts, "model.classification.vit.moe_layer_period", 2) or 2, 1)
        moe_cls = None
        if moe_experts > 0:
            from cvnets_tpu.modules.moe import MoETransformerEncoder
            moe_cls = MoETransformerEncoder
        if self.gradient_checkpointing and getattr(
                opts, "model.classification.vit.checkpoint_segments", 4):
            block_cls = nn.remat(TransformerEncoder, static_argnums=(5,))
            if moe_cls is not None:
                moe_cls = nn.remat(MoETransformerEncoder, static_argnums=(5,))
        for i in range(n_layers):
            # GShard-style alternation: every moe_period-th block is sparse
            if moe_cls is not None and (i + 1) % moe_period == 0:
                tokens = moe_cls(
                    opts=opts, embed_dim=embed_dim,
                    ffn_latent_dim=cfg["ffn_dim"],
                    num_heads=cfg["n_attn_heads"],
                    num_experts=moe_experts,
                    top_k=getattr(
                        opts, "model.classification.vit.moe_top_k", 2) or 2,
                    capacity_factor=getattr(
                        opts, "model.classification.vit.moe_capacity_factor",
                        1.25) or 1.25,
                    attn_dropout=cfg["attn_dropout"], dropout=cfg["dropout"],
                    transformer_norm_layer=cfg["norm_layer"],
                    norm_eps=1e-6, name=f"transformer_{i}",
                )(tokens, None, None, None, training)
                continue
            tokens = block_cls(
                opts=opts, embed_dim=embed_dim, ffn_latent_dim=cfg["ffn_dim"],
                num_heads=cfg["n_attn_heads"], attn_dropout=cfg["attn_dropout"],
                dropout=cfg["dropout"], ffn_dropout=cfg["ffn_dropout"],
                transformer_norm_layer=cfg["norm_layer"],
                stochastic_dropout=sd_prob * i / max(n_layers - 1, 1),
                norm_eps=1e-6,  # reference vit.py:204-208 forces 1e-6 on all LNs
                name=f"transformer_{i}",
            )(tokens, None, None, None, training)
        norm = get_normalization_layer(opts, norm_type=cfg["norm_layer"], eps=1e-6)
        tokens = norm.copy(name="post_transformer_norm")(tokens)

        if use_cls_token:
            cls_embedding = tokens[:, 0]
            image_embedding = tokens[:, 1:]
        else:
            cls_embedding = jnp.mean(tokens, axis=1)
            image_embedding = tokens

        from cvnets_tpu.layers.dtype_utils import compute_dtype
        from cvnets_tpu.layers.init_utils import linear_init
        from cvnets_tpu.quantization import quant_dense

        logits = quant_dense(opts, training, self.n_classes,
                             kernel_init=linear_init(opts),
                             dtype=compute_dtype(opts),
                             name="classifier")(cls_embedding)
        if return_image_embeddings:
            emb = image_embedding.reshape(b, n_h, n_w, c)
            if not getattr(opts, "model.classification.vit.use_simple_fpn",
                           False):
                return logits, emb
            # ViTDet simple FPN (reference vit.py:194-199, 350-412): the
            # stride-16 token grid fans out to strides 4/8/16/32 via deconvs
            # and pooling — the multi-scale taps Mask R-CNN consumes
            l2 = TransposeConvLayer2d(
                opts=opts, out_channels=c // 2, kernel_size=2, stride=2,
                use_norm=True, use_act=True, name="simple_fpn_l2_0",
            )(emb, training=training)
            l2 = TransposeConvLayer2d(
                opts=opts, out_channels=c // 4, kernel_size=2, stride=2,
                bias=True, use_norm=False, use_act=False,
                name="simple_fpn_l2_1",
            )(l2, training=training)
            l3 = TransposeConvLayer2d(
                opts=opts, out_channels=c // 2, kernel_size=2, stride=2,
                bias=True, use_norm=False, use_act=False,
                name="simple_fpn_l3",
            )(emb, training=training)
            l5 = nn.max_pool(emb, (2, 2), strides=(2, 2))
            return logits, {"out_l2": l2, "out_l3": l3, "out_l4": emb,
                            "out_l5": l5}
        return logits

    def extract_end_points_all(self, x, use_l5: bool = True, use_l5_exp: bool = False,
                               training: bool = False) -> Dict[str, jnp.ndarray]:
        _logits, image_embedding = self(x, training=training,
                                        return_image_embeddings=True)
        if isinstance(image_embedding, dict):  # simple-FPN multi-scale taps
            return image_embedding
        return {"out_l5": image_embedding}

    def get_lr_multipliers(self, opts) -> Dict[str, float]:
        """Layer-wise LR decay: rate ** (n_layers - i) per transformer block
        (reference base_image_encoder.py:303 + vit.py layer_wise hooks)."""
        if not getattr(opts, "model.classification.enable_layer_wise_lr_decay",
                       False):
            return {}
        rate = getattr(opts, "model.classification.layer_wise_lr_decay_rate", 1.0)
        if rate == 1.0:
            return {}
        n_layers = self._config()["n_transformer_layers"]
        mults = {r"patch_emb|pos_embed|cls_token": rate ** (n_layers + 1)}
        for i in range(n_layers):
            mults[rf"transformer_{i}/"] = rate ** (n_layers - i)
        return mults
