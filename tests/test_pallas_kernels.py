"""Pallas kernel tests: fused separable attention matches the XLA reference in
forward AND gradient (custom VJP). On CPU the op falls back to the reference path,
so these validate the VJP math; the TPU kernel itself is exercised by bench.py and
interpret-mode below."""

import jax
import jax.numpy as jnp
import numpy as np


def _qkv(bp=4, n=32, c=128, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((bp, n, 1)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bp, n, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bp, n, c)).astype(np.float32))
    return q, k, v


def test_forward_matches_reference():
    from cvnets_tpu.ops.pallas.mobilevit_attn import (
        _reference_forward,
        separable_attention_core,
    )

    q, k, v = _qkv()
    out = separable_attention_core(q, k, v)
    ref = _reference_forward(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_interpret_mode_kernel():
    """Run the actual Pallas kernel body under the interpreter (CPU)."""
    from jax.experimental import pallas as pl

    from cvnets_tpu.ops.pallas.mobilevit_attn import (
        _attn_kernel,
        _reference_forward,
    )

    q, k, v = _qkv(bp=2, n=16, c=128)
    out = pl.pallas_call(
        _attn_kernel,
        grid=(2,),
        in_specs=[
            pl.BlockSpec((1, 16, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 16, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 16, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 16, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 16, 128), jnp.float32),
        interpret=True,
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_reference_forward(q, k, v)), atol=1e-5)


def test_custom_vjp_matches_autodiff():
    from cvnets_tpu.ops.pallas.mobilevit_attn import (
        _reference_forward,
        separable_attention_core,
    )

    q, k, v = _qkv(bp=2, n=8, c=16)

    def f_custom(q, k, v):
        return jnp.sum(separable_attention_core(q, k, v) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_reference_forward(q, k, v) ** 2)

    g_custom = jax.grad(f_custom, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for gc, gr in zip(g_custom, g_ref):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


def test_mobilevitv2_with_kernel_flag_parity():
    """Model outputs identical with the kernel path on/off (CPU fallback path)."""
    from cvnets_tpu.models import get_model
    from cvnets_tpu.options.opts import get_training_arguments

    outs = {}
    for flag in (True, False):
        opts = get_training_arguments(args=[
            "--model.classification.name", "mobilevit_v2",
            "--model.classification.n-classes", "7",
            "--dataset.category", "classification",
        ])
        setattr(opts, "model.enable_pallas_kernels", flag)
        model = get_model(opts)
        rng = jax.random.PRNGKey(0)
        x = jnp.ones((1, 32, 32, 3))
        v = model.init({"params": rng, "dropout": rng}, x, training=False)
        outs[flag] = model.apply(v, x, training=False)
    np.testing.assert_allclose(np.asarray(outs[True]), np.asarray(outs[False]),
                               atol=1e-5)
