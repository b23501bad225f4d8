"""Pyramid scene parsing module (parity: reference cvnets/modules/pspnet_module.py:17)."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cvnets_tpu.layers.conv_layer import ConvLayer2d
from cvnets_tpu.layers.pool import adaptive_avg_pool_2d


class PSP(nn.Module):
    opts: Any
    out_channels: int = 512
    pool_sizes: Sequence[int] = (1, 2, 3, 6)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        reduction = max(1, in_ch // len(self.pool_sizes))
        branches = [x]
        for i, ps in enumerate(self.pool_sizes):
            b = adaptive_avg_pool_2d(x, (ps, ps))
            b = ConvLayer2d(opts=self.opts, out_channels=reduction, kernel_size=1,
                            use_norm=True, use_act=True,
                            name=f"psp_branch_{i}")(b, training=training)
            b = jax.image.resize(b, (x.shape[0], x.shape[1], x.shape[2], reduction),
                                 method="bilinear")
            branches.append(b)
        y = jnp.concatenate(branches, axis=-1)
        y = ConvLayer2d(opts=self.opts, out_channels=self.out_channels,
                        kernel_size=3, use_norm=True, use_act=True,
                        name="fusion")(y, training=training)
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=not training)(y)
        return y
