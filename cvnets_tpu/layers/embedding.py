"""Token embedding (parity: reference cvnets/layers/embedding.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Embedding(nn.Module):
    num_embeddings: int
    embedding_dim: int
    padding_idx: int = -1

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "weight",
            nn.initializers.normal(stddev=self.embedding_dim**-0.5),
            (self.num_embeddings, self.embedding_dim),
        )
        out = jnp.take(table, ids, axis=0)
        if self.padding_idx >= 0:
            out = jnp.where((ids == self.padding_idx)[..., None], 0.0, out)
        return out
