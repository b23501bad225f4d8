"""MobileViTv2 separable (linear-complexity) self-attention.

Parity: reference cvnets/layers/linear_attention.py:16-207 (LinearSelfAttention):
qkv produced by a 1×1 conv and split into (1, d, d); softmax over the token axis on
the 1-dim query scores; context = sum(key * scores); out = relu(value) * context,
then a 1×1 output conv. O(N·d) instead of O(N²·d).

Layout note: the reference operates on (B, C, P, N) unfolded patches. We operate on
(B, P, N, C) — channels last — so the 1×1 convs are Dense layers over the trailing
axis, which XLA maps straight onto the MXU. A fused Pallas kernel for the full
unfold→attention→fold pipeline lives in cvnets_tpu/ops/pallas/mobilevit_attn.py.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.dtype_utils import compute_dtype
from cvnets_tpu.layers.init_utils import conv_init


class LinearSelfAttention(nn.Module):
    opts: Any
    embed_dim: int
    attn_dropout: float = 0.0
    bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_prev: Optional[jnp.ndarray] = None,
        training: bool = False,
    ) -> jnp.ndarray:
        """x: (B, P, N, C) patches-last-channels tensor. x_prev enables cross-attention
        (reference _forward_cross_attn, linear_attention.py:163-207)."""
        from cvnets_tpu.quantization import quant_dense

        d = self.embed_dim
        init = conv_init(self.opts)
        dt = compute_dtype(self.opts)

        qkv_proj = quant_dense(self.opts, training, 1 + 2 * d,
                               use_bias=self.bias, kernel_init=init,
                               dtype=dt, name="qkv_proj")
        if x_prev is None:
            qkv = qkv_proj(x)
            query, key, value = jnp.split(qkv, [1, 1 + d], axis=-1)
        else:
            # cross-attn: query+key from x_prev, value from x, all through
            # SLICES of the same fused qkv weights (reference
            # _forward_cross_attn :163-207 slices the conv kernel) — so an
            # image-pretrained checkpoint drops into the temporal model
            query, key, _ = jnp.split(qkv_proj(x_prev), [1, 1 + d], axis=-1)
            _, _, value = jnp.split(qkv_proj(x), [1, 1 + d], axis=-1)

        use_pallas = getattr(self.opts, "model.enable_pallas_kernels", True) \
            and self.attn_dropout == 0.0
        if use_pallas:
            # fused Pallas kernel: softmax→context→relu·context in one VMEM pass
            from cvnets_tpu.ops.pallas.mobilevit_attn import (
                separable_attention_bphw,
            )

            out = separable_attention_bphw(query, key, value)
        else:
            # softmax over token axis N (axis=-2 in B,P,N,C layout)
            scores = nn.softmax(query.astype(jnp.float32), axis=-2).astype(x.dtype)
            if self.attn_dropout > 0:
                scores = nn.Dropout(rate=self.attn_dropout,
                                    deterministic=not training)(scores)
            # context vector: weighted sum of keys over tokens -> (B, P, 1, C)
            context = jnp.sum(key * scores, axis=-2, keepdims=True)
            out = nn.relu(value) * context
        out = quant_dense(self.opts, training, d, use_bias=self.bias,
                          kernel_init=init, dtype=dt, name="out_proj")(out)
        return out
