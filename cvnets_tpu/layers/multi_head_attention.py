"""Multi-head attention (parity: reference cvnets/layers/multi_head_attention.py:309).

The reference carries three forward paths (tracing/default/pytorch-fused); on TPU a
single fused einsum formulation is optimal — XLA maps the batched matmuls onto the MXU
and fuses the softmax. Single-head attention (reference single_head_attention.py) is
the num_heads=1 case.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from cvnets_tpu.layers.dtype_utils import compute_dtype
from cvnets_tpu.layers.init_utils import linear_init


class MultiHeadAttention(nn.Module):
    opts: Any
    embed_dim: int
    num_heads: int
    attn_dropout: float = 0.0
    bias: bool = True
    coreml_compatible: bool = False  # config-compat; single path on TPU

    @nn.compact
    def __call__(
        self,
        x_q: jnp.ndarray,
        x_kv: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        training: bool = False,
    ) -> jnp.ndarray:
        if x_kv is None:
            x_kv = x_q
        d = self.embed_dim
        h = self.num_heads
        hd = d // h
        assert hd * h == d, "embed_dim must be divisible by num_heads"

        from cvnets_tpu.quantization import quant_dense

        qkv_init = linear_init(self.opts)
        dt = compute_dtype(self.opts)
        # One fused qkv projection (reference multi_head_attention.py keeps a single
        # qkv_proj Linear): a single (d, 3d) matmul tiles better on the MXU than three
        # (d, d) ones, and keeps torch-checkpoint enumeration order identical.
        # quant_dense routes qkv/out through the int8 path at inference when
        # --common.int8-inference is set (same param tree).
        qkv_proj = quant_dense(
            self.opts, training, 3 * d, use_bias=self.bias,
            kernel_init=qkv_init, dtype=dt, name="qkv_proj"
        )
        if x_kv is x_q:
            q, k, v = jnp.split(qkv_proj(x_q), 3, axis=-1)
        else:
            q = qkv_proj(x_q)[..., :d]
            kv = qkv_proj(x_kv)
            k, v = kv[..., d:2 * d], kv[..., 2 * d:]

        b, nq, _ = q.shape
        nk = k.shape[1]
        scale = hd**-0.5
        # Fused flash-attention kernel (ops/pallas/mha_attn.py): consumes
        # q/k/v pre-reshape in the (B, S, H·D) projection layout, and the
        # (S, S) attention matrix never leaves VMEM. Eligible whenever the
        # probs are not needed in HBM (no dropout on them), the mask is a key
        # mask, and the tiles fit the kernel's VMEM budget.
        from cvnets_tpu.ops.pallas.mha_attn import (
            fused_attention_eligible,
            fused_mha_attention,
        )

        if (attn_mask is None and nq == nk
                and (self.attn_dropout == 0 or not training)):
            km = None
            if key_padding_mask is not None:
                km = jnp.where(key_padding_mask, -1e30, 0.0)
            # Sequence parallelism (--dev.sequence-parallel): shard the token
            # dim over the mesh's 'model' axis and run ring attention — kv
            # slices rotate via ppermute, no device holds the full sequence
            # (parallel/ring_attention.py). Takes precedence over the local
            # Pallas kernels: when SP is on the point is memory scaling.
            if getattr(self.opts, "dev.sequence_parallel", False):
                from cvnets_tpu.parallel.mesh import MODEL_AXIS, get_active_mesh
                from cvnets_tpu.parallel.ring_attention import (
                    ring_attention,
                    ring_attention_eligible,
                )

                mesh = get_active_mesh()
                if ring_attention_eligible(mesh, nq, MODEL_AXIS):
                    out = ring_attention(q * scale, k, v, h, mesh, km)
                    return quant_dense(self.opts, training, d,
                                       use_bias=self.bias,
                                       kernel_init=qkv_init, dtype=dt,
                                       name="out_proj")(out)
            if fused_attention_eligible(nq, d):
                out = fused_mha_attention(q * scale, k, v, h, km)
                return quant_dense(self.opts, training, d, use_bias=self.bias,
                                   kernel_init=qkv_init, dtype=dt,
                                   name="out_proj")(out)
        q = q.reshape(b, nq, h, hd)
        k = k.reshape(b, nk, h, hd)
        v = v.reshape(b, nk, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        if attn_mask is not None:
            logits = logits + attn_mask
        if key_padding_mask is not None:
            neg = jnp.finfo(logits.dtype).min
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
        if self.attn_dropout > 0:
            attn = nn.Dropout(rate=self.attn_dropout, deterministic=not training)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, nq, d)
        return quant_dense(self.opts, training, d, use_bias=self.bias,
                           kernel_init=qkv_init, dtype=dt, name="out_proj")(out)


SingleHeadAttention = MultiHeadAttention  # num_heads=1
