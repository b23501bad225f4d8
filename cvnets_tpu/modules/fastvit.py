"""FastViT modules (parity: reference cvnets/modules/fastvit.py:625LoC;
arXiv:2303.14189): RepMixer (reparam token mixer), ConvFFN, RepCPE (conditional
positional encoding), attention block, patch-embedding downsampler built from
RepLK + MobileOne blocks."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.layers.dtype_utils import compute_dtype
from cvnets_tpu.layers.init_utils import linear_init
from cvnets_tpu.layers.random_layers import StochasticDepth
from cvnets_tpu.modules.mobileone_block import MobileOneBlock, RepLKBlock


class RepMixer(nn.Module):
    """x + (mix(x) - norm_mix(x)) token mixer; reparameterizable depthwise convs
    (reference fastvit.py RepMixer)."""

    opts: Any
    dim: int
    kernel_size: int = 3
    use_layer_scale: bool = True
    layer_scale_init_value: float = 1e-5
    inference_mode: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        if self.inference_mode:
            return ConvLayer2d(opts=self.opts, out_channels=self.dim,
                               kernel_size=self.kernel_size, groups=self.dim,
                               bias=True, use_norm=False, use_act=False,
                               name="reparam_conv")(x, training=training)
        # layer_scale first: torch enumerates a module's direct parameters
        # before its submodules (reference fastvit.py:199-221)
        ls = None
        if self.use_layer_scale:
            ls = self.param(
                "layer_scale",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,))
        norm = MobileOneBlock(opts=self.opts, in_channels=self.dim,
                              out_channels=self.dim, kernel_size=self.kernel_size,
                              groups=self.dim, use_act=False, num_conv_branches=0,
                              use_scale_branch=False,
                              name="norm")(x, training=training)
        mix = MobileOneBlock(opts=self.opts, in_channels=self.dim,
                             out_channels=self.dim, kernel_size=self.kernel_size,
                             groups=self.dim, use_act=False, num_conv_branches=1,
                             name="mixer")(x, training=training)
        if ls is not None:
            return x + ls.astype(x.dtype) * (mix - norm)
        return x + mix - norm


class ConvFFN(nn.Module):
    """7×7 dw conv + BN → 1×1 expand → act → 1×1 project (reference ConvFFN)."""

    opts: Any
    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        from cvnets_tpu.layers.activation import build_act_layer

        y = ConvLayer2d(opts=self.opts, out_channels=self.dim, kernel_size=7,
                        groups=self.dim, use_norm=True, use_act=False,
                        name="conv_dw")(x, training=training)
        y = ConvLayer2d(opts=self.opts, out_channels=self.hidden_dim, kernel_size=1,
                        use_norm=False, use_act=False, bias=True,
                        name="fc1")(y, training=training)
        y = build_act_layer(self.opts)(y)
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)
        y = ConvLayer2d(opts=self.opts, out_channels=self.dim, kernel_size=1,
                        use_norm=False, use_act=False, bias=True,
                        name="fc2")(y, training=training)
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)
        return y


class RepCPE(nn.Module):
    """Reparameterizable conditional positional encoding: dw conv + identity
    (reference fastvit.py RepCPE)."""

    opts: Any
    dim: int
    spatial_shape: tuple = (7, 7)
    inference_mode: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        y = ConvLayer2d(opts=self.opts, out_channels=self.dim,
                        kernel_size=self.spatial_shape[0], groups=self.dim,
                        bias=True, use_norm=False, use_act=False,
                        name="pe_conv")(x, training=training)
        if self.inference_mode:
            return y
        return y + x


class AttentionBlock(nn.Module):
    """BN → MHSA over flattened tokens → residual, then ConvFFN residual
    (reference fastvit.py attention stage)."""

    opts: Any
    dim: int
    mlp_ratio: float = 4.0
    num_heads: int = 8
    dropout: float = 0.0
    stochastic_depth_prob: float = 0.0
    use_layer_scale: bool = True
    layer_scale_init_value: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        ls1 = ls2 = None
        if self.use_layer_scale:
            ls1 = self.param("layer_scale_1",
                             nn.initializers.constant(self.layer_scale_init_value),
                             (self.dim,))
            ls2 = self.param("layer_scale_2",
                             nn.initializers.constant(self.layer_scale_init_value),
                             (self.dim,))
        y = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                         use_running_average=not training, name="norm")(x)
        tokens = y.reshape(b, h * w, c)
        dt = compute_dtype(self.opts)
        hd = self.dim // self.num_heads
        from cvnets_tpu.quantization import quant_dense

        qkv = quant_dense(self.opts, training, 3 * self.dim,
                          kernel_init=linear_init(self.opts), dtype=dt,
                          name="qkv")(tokens)
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3, self.num_heads, hd), 3, axis=2)
        q, k, v = q.squeeze(2), k.squeeze(2), v.squeeze(2)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q * hd**-0.5, k)
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h * w, self.dim)
        out = quant_dense(self.opts, training, self.dim,
                          kernel_init=linear_init(self.opts), dtype=dt,
                          name="proj")(out).reshape(b, h, w, c)
        if ls1 is not None:
            out = ls1.astype(out.dtype) * out
        out = StochasticDepth(p=self.stochastic_depth_prob)(out, training=training)
        x = x + out
        y = ConvFFN(opts=self.opts, dim=self.dim,
                    hidden_dim=int(self.dim * self.mlp_ratio),
                    dropout=self.dropout, name="ffn")(x, training=training)
        if ls2 is not None:
            y = ls2.astype(y.dtype) * y
        y = StochasticDepth(p=self.stochastic_depth_prob)(y, training=training)
        return x + y


class RepMixerBlock(nn.Module):
    opts: Any
    dim: int
    kernel_size: int = 3
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    stochastic_depth_prob: float = 0.0
    use_layer_scale: bool = True
    layer_scale_init_value: float = 1e-5
    inference_mode: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        ls = None
        if self.use_layer_scale:
            ls = self.param(
                "layer_scale",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,))
        x = RepMixer(opts=self.opts, dim=self.dim, kernel_size=self.kernel_size,
                     use_layer_scale=self.use_layer_scale,
                     layer_scale_init_value=self.layer_scale_init_value,
                     inference_mode=self.inference_mode,
                     name="token_mixer")(x, training=training)
        y = ConvFFN(opts=self.opts, dim=self.dim,
                    hidden_dim=int(self.dim * self.mlp_ratio),
                    dropout=self.dropout, name="ffn")(x, training=training)
        if ls is not None:
            y = ls.astype(y.dtype) * y
        y = StochasticDepth(p=self.stochastic_depth_prob)(y, training=training)
        return x + y


class PatchEmbed(nn.Module):
    """RepLK 7×7 s2 depthwise + MobileOne 1×1 downsampler (reference fastvit.py
    convolutional_stem / PatchEmbed)."""

    opts: Any
    in_channels: int
    embed_dim: int
    patch_size: int = 7
    stride: int = 2
    inference_mode: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        # reference PatchEmbed (fastvit.py:88-121): grouped RepLK conv doing
        # BOTH the spatial downsample and the channel expansion, then a
        # MobileOne 1x1 block (conv branch + BN skip)
        x = RepLKBlock(opts=self.opts, channels=self.in_channels,
                       out_channels=self.embed_dim, groups=self.in_channels,
                       kernel_size=self.patch_size, small_kernel=3,
                       stride=self.stride, inference_mode=self.inference_mode,
                       name="replk")(x, training=training)
        x = MobileOneBlock(opts=self.opts, in_channels=self.embed_dim,
                           out_channels=self.embed_dim, kernel_size=1, stride=1,
                           groups=1, use_se=False, num_conv_branches=1,
                           inference_mode=self.inference_mode,
                           name="proj")(x, training=training)
        return x
