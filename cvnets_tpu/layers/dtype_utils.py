"""Mixed-precision policy (replaces reference AMP/GradScaler, engine/utils.py:16-36).

On TPU: compute dtype bfloat16 (native MXU), parameters/optimizer state float32,
no loss scaling needed. ``compute_dtype(opts)`` is threaded into every Dense/Conv/
Norm; flax computes BatchNorm statistics in float32 internally regardless.
"""

from __future__ import annotations

import jax.numpy as jnp

_DTYPES = {
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float": jnp.float32,
}


def compute_dtype(opts):
    if opts is None:
        return jnp.float32
    if not getattr(opts, "common.mixed_precision", False):
        return jnp.float32
    name = getattr(opts, "common.mixed_precision_dtype", "bfloat16") or "bfloat16"
    return _DTYPES.get(name, jnp.bfloat16)
