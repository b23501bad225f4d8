"""Mixture-of-Experts FFN with expert parallelism (beyond the reference).

The reference (apple/ml-cvnets) has no MoE and no model parallelism
(SURVEY.md §2.8); this module adds a GShard/Switch-style sparse FFN designed
TPU-first:

* **Static shapes everywhere**: top-k routing with a fixed per-expert
  capacity ``C = ceil(k * tokens * capacity_factor / E)``; tokens over
  capacity are dropped (their combine weight is zero, the residual carries
  them). No sorting, no dynamic gather — dispatch and combine are one-hot
  einsums the MXU eats directly.
* **Expert parallelism**: expert weights are stacked with a leading E dim
  (``experts_fc1``: (E, D, F), ``experts_fc2``: (E, F, D)) which
  ``parallel/sharding_rules.py`` shards over the mesh's ``model`` axis; the
  (E, C, D) dispatched activations carry a matching sharding constraint so
  GSPMD places each expert's FFN on its own device group and inserts the
  all-to-all-equivalent collectives over ICI.
* **Router numerics**: routing runs in f32 regardless of ``compute_dtype``
  (bf16 logits make top-k ties nondeterministic across backends).
* The load-balance auxiliary loss (Shazeer et al.: E * sum_e f_e * p_e) is
  ``sow``-n into the ``moe_loss`` collection; the train step adds it with
  ``--model.moe.aux-loss-weight`` (a no-op sow when the collection isn't
  mutable, so eval/export paths need no changes).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cvnets_tpu.layers.activation import build_act_layer
from cvnets_tpu.layers.dtype_utils import compute_dtype
from cvnets_tpu.layers.init_utils import linear_init


def _expert_sharding_constraint(x: jnp.ndarray) -> jnp.ndarray:
    """Pin the leading (expert) dim of (E, C, D) tensors to the model axis so
    GSPMD runs each expert's matmul on its own device group. No-op without an
    active mesh or a >1 model axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cvnets_tpu.parallel.mesh import MODEL_AXIS, get_active_mesh

    mesh = get_active_mesh()
    if mesh is None or mesh.shape.get(MODEL_AXIS, 1) <= 1:
        return x
    if x.shape[0] % mesh.shape[MODEL_AXIS] != 0:
        return x
    spec = P(MODEL_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


class MoEFFN(nn.Module):
    """Sparse FFN: route each token to its top-k of ``num_experts`` FFNs."""

    opts: Any
    embed_dim: int
    ffn_latent_dim: int
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 1.25
    act_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b, s, d = x.shape
        e, f, k = self.num_experts, self.ffn_latent_dim, self.top_k
        assert 1 <= k <= e, f"top_k={k} out of range for {e} experts"
        dt = compute_dtype(self.opts)
        tokens = x.reshape(b * s, d)
        t = b * s
        cap = int(-(-(k * t * self.capacity_factor) // e))  # ceil
        cap = min(max(cap, 1), t)

        # --- routing (f32) ---------------------------------------------
        logits = nn.Dense(e, use_bias=False, dtype=jnp.float32,
                          kernel_init=linear_init(self.opts),
                          name="router")(tokens.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)                 # (T, E)

        combine = jnp.zeros((t, e, cap), jnp.float32)
        masked = probs
        # per-expert running fill count across the k assignment rounds
        fill = jnp.zeros((e,), jnp.int32)
        importance = jnp.zeros((e,), jnp.float32)  # fraction routed per expert
        for _ in range(k):
            gate = jnp.max(masked, axis=-1)                     # (T,)
            idx = jnp.argmax(masked, axis=-1)                   # (T,)
            onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)  # (T, E)
            # position of each token inside its expert's buffer this round,
            # offset by what earlier rounds already filled
            pos = (jnp.cumsum(onehot, axis=0) - 1.0
                   + fill[None, :].astype(jnp.float32))         # (T, E)
            pos = jnp.sum(pos * onehot, axis=-1)                # (T,)
            keep = (pos < cap).astype(jnp.float32)
            poshot = jax.nn.one_hot(pos.astype(jnp.int32), cap,
                                    dtype=jnp.float32)          # (T, C)
            combine = combine + (gate * keep)[:, None, None] \
                * onehot[:, :, None] * poshot[:, None, :]
            fill = fill + jnp.sum(onehot * keep[:, None],
                                  axis=0).astype(jnp.int32)
            importance = importance + jnp.mean(onehot, axis=0)
            masked = masked * (1.0 - onehot)                    # next round

        # renormalize the kept gates so each token's expert mix sums to 1
        denom = jnp.sum(combine, axis=(1, 2), keepdims=True)
        combine = combine / jnp.maximum(denom, 1e-9)
        dispatch = (combine > 0).astype(tokens.dtype)           # (T, E, C)

        # load-balance aux loss: E * sum_e mean-router-prob * mean-assignment
        aux = e * jnp.sum(jnp.mean(probs, axis=0) * importance / k)
        self.sow("moe_loss", "load_balance", aux)

        # --- expert FFNs (stacked, expert-parallel) ---------------------
        w1 = self.param("experts_fc1", nn.initializers.normal(stddev=0.02),
                        (e, d, f))
        b1 = self.param("experts_fc1_bias", nn.initializers.zeros, (e, 1, f))
        w2 = self.param("experts_fc2", nn.initializers.normal(stddev=0.02),
                        (e, f, d))
        b2 = self.param("experts_fc2_bias", nn.initializers.zeros, (e, 1, d))
        xin = jnp.einsum("tec,td->ecd", dispatch, tokens)       # (E, C, D)
        xin = _expert_sharding_constraint(xin)
        h = jnp.einsum("ecd,edf->ecf", xin.astype(dt), w1.astype(dt)) \
            + b1.astype(dt)
        h = build_act_layer(self.opts, act_name=self.act_name)(h)
        out = jnp.einsum("ecf,efd->ecd", h, w2.astype(dt)) + b2.astype(dt)
        out = _expert_sharding_constraint(out)
        y = jnp.einsum("tec,ecd->td", combine.astype(out.dtype), out)
        return y.reshape(b, s, d)


class MoETransformerEncoder(nn.Module):
    """Pre-norm MHA + MoE-FFN block: ``TransformerEncoder`` with the dense FFN
    swapped for :class:`MoEFFN` (see modules/transformer.py for the dense
    twin; reference cvnets/modules/transformer.py:26 has no sparse variant)."""

    opts: Any
    embed_dim: int
    ffn_latent_dim: int
    num_heads: int = 8
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 1.25
    attn_dropout: float = 0.0
    dropout: float = 0.0
    transformer_norm_layer: str = "layer_norm"
    norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_prev: Optional[jnp.ndarray] = None,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 attn_mask: Optional[jnp.ndarray] = None,
                 training: bool = False) -> jnp.ndarray:
        from cvnets_tpu.layers.multi_head_attention import MultiHeadAttention
        from cvnets_tpu.modules.transformer import _norm

        y = _norm(self.opts, self.transformer_norm_layer, "pre_norm_mha",
                  self.norm_eps)(x)
        y = MultiHeadAttention(
            opts=self.opts, embed_dim=self.embed_dim,
            num_heads=self.num_heads, attn_dropout=self.attn_dropout,
            name="mha",
        )(y, x_kv=x_prev, key_padding_mask=key_padding_mask,
          attn_mask=attn_mask, training=training)
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)
        x = x + y
        y = _norm(self.opts, self.transformer_norm_layer, "pre_norm_ffn",
                  self.norm_eps)(x)
        y = MoEFFN(
            opts=self.opts, embed_dim=self.embed_dim,
            ffn_latent_dim=self.ffn_latent_dim, num_experts=self.num_experts,
            top_k=self.top_k, capacity_factor=self.capacity_factor,
            name="moe_ffn",
        )(y, training=training)
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)
        return x + y
