"""Linear layers (parity: reference cvnets/layers/linear_layer.py)."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.dtype_utils import compute_dtype
from cvnets_tpu.layers.init_utils import group_linear_init, linear_init


class LinearLayer(nn.Module):
    """Dense layer; weights stored as (in, out) which is MXU-friendly."""

    opts: Any
    out_features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        from cvnets_tpu.quantization import quant_dense

        # quant_dense swaps in Int8Dense (identical param tree,
        # "linear/kernel[,bias]") only when --common.int8-inference is set AND
        # this is an inference pass — mirroring ConvLayer2d's training gate so
        # no gradient path ever trains through jnp.round
        return quant_dense(
            self.opts, training, self.out_features,
            use_bias=self.bias,
            kernel_init=linear_init(self.opts),
            dtype=compute_dtype(self.opts),
            name="linear",
        )(x)


class GroupLinear(nn.Module):
    """Grouped linear: input split into ``n_groups`` along features, each group has its
    own (in/g, out/g) weight (parity: reference GroupLinear, used by LocationPreserving
    ViT variants). Implemented as a batched einsum so all groups hit the MXU together.
    """

    opts: Any
    in_features: int
    out_features: int
    n_groups: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.n_groups
        assert self.in_features % g == 0 and self.out_features % g == 0
        in_g = self.in_features // g
        out_g = self.out_features // g
        w = self.param("weight", group_linear_init(self.opts),
                       (g, in_g, out_g))
        leading = x.shape[:-1]
        xg = x.reshape(*leading, g, in_g)
        y = jnp.einsum("...gi,gio->...go", xg, w)
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (g, out_g))
            y = y + b
        return y.reshape(*leading, self.out_features)
