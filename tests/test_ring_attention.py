"""Ring attention (sequence parallelism over the 'model' mesh axis): exact
softmax attention with the sequence sharded and kv rotating via ppermute.
Beyond-reference feature — the reference (SURVEY.md §2.8) has replicated DDP
only. Checks: math identity vs full attention (fwd + grads), composition with
data parallelism on a (data, model) mesh, no kv all-gather in the compiled
program, and the MultiHeadAttention routing under --dev.sequence-parallel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _qkv(b=4, s=64, h=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    e = h * d
    q = jnp.asarray(rng.standard_normal((b, s, e)), jnp.float32) * 0.4
    k = jnp.asarray(rng.standard_normal((b, s, e)), jnp.float32) * 0.4
    v = jnp.asarray(rng.standard_normal((b, s, e)), jnp.float32)
    return q, k, v


def _gold(q, k, v, heads, key_mask=None):
    b, s, e = q.shape
    d = e // heads
    qh, kh, vh = (t.reshape(b, s, heads, d) for t in (q, k, v))
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
    if key_mask is not None:
        logits = logits + key_mask[:, None, None, :]
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b, s, e)


def _mesh(shape, names):
    return Mesh(np.asarray(jax.devices()[:8]).reshape(shape), names)


def test_ring_attention_matches_full():
    from cvnets_tpu.parallel.ring_attention import ring_attention

    mesh = _mesh((8,), ("model",))
    q, k, v = _qkv()
    key_mask = jnp.where(
        jnp.asarray(np.random.default_rng(1).random((4, 64))) < 0.2,
        -1e30, 0.0).astype(jnp.float32)
    for km in (None, key_mask):
        out = jax.jit(lambda *t: ring_attention(t[0], t[1], t[2], 4, mesh,
                                                km))(q, k, v)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(_gold(q, k, v, 4, km)),
                                   atol=1e-5)
        g1 = jax.jit(jax.grad(lambda *t: jnp.sum(ring_attention(
            t[0], t[1], t[2], 4, mesh, km) ** 2), argnums=(0, 1, 2)))(q, k, v)
        g2 = jax.jit(jax.grad(lambda *t: jnp.sum(_gold(
            t[0], t[1], t[2], 4, km) ** 2), argnums=(0, 1, 2)))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


def test_ring_attention_composes_with_dp():
    """(data=2, model=4) mesh: batch shards over data, sequence over model;
    the compiled program must not all-gather the kv sequence dim."""
    from cvnets_tpu.parallel.ring_attention import ring_attention

    mesh = _mesh((2, 4), ("data", "model"))
    q, k, v = _qkv(b=4, s=64)
    sh = NamedSharding(mesh, P("data", "model", None))
    qs, ks, vs = (jax.device_put(t, sh) for t in (q, k, v))
    f = jax.jit(lambda *t: ring_attention(t[0], t[1], t[2], 4, mesh))
    out = f(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_gold(q, k, v, 4)), atol=1e-5)
    txt = f.lower(qs, ks, vs).compile().as_text()
    assert "all-gather" not in txt, "ring attention all-gathered the sequence"
    # collective-permute is the ring's signature op
    assert "collective-permute" in txt
    # output keeps the sequence sharded over 'model'
    assert "model" in str(out.sharding.spec)


def test_mha_layer_routes_through_ring_attention():
    """--dev.sequence-parallel routes MultiHeadAttention through the ring and
    keeps the output numerically identical to the local einsum path."""
    from cvnets_tpu.layers.multi_head_attention import MultiHeadAttention
    from cvnets_tpu.options.opts import get_training_arguments
    from cvnets_tpu.parallel.mesh import set_active_mesh

    opts = get_training_arguments(args=[
        "--model.classification.name", "vit",
        "--dataset.category", "classification"])
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 32)),
                    jnp.float32)
    mha = MultiHeadAttention(opts=opts, embed_dim=32, num_heads=4)
    variables = mha.init({"params": jax.random.PRNGKey(0)}, x)
    y_local = mha.apply(variables, x)

    mesh = _mesh((2, 4), ("data", "model"))
    setattr(opts, "dev.sequence_parallel", True)
    set_active_mesh(mesh)
    try:
        f = jax.jit(lambda xx: mha.apply(variables, xx))
        y_ring = f(x)
        txt = f.lower(x).compile().as_text()
        assert "collective-permute" in txt, (
            "sequence-parallel MHA did not route through ring attention")
    finally:
        set_active_mesh(None)
        setattr(opts, "dev.sequence_parallel", False)
    np.testing.assert_allclose(np.asarray(y_ring), np.asarray(y_local),
                               atol=2e-5)


def test_ring_attention_ineligible_falls_back():
    """Sequence not divisible by the model axis -> the layer silently keeps
    the local path (no shard_map error mid-model)."""
    from cvnets_tpu.layers.multi_head_attention import MultiHeadAttention
    from cvnets_tpu.options.opts import get_training_arguments
    from cvnets_tpu.parallel.mesh import set_active_mesh

    opts = get_training_arguments(args=[
        "--model.classification.name", "vit",
        "--dataset.category", "classification"])
    setattr(opts, "dev.sequence_parallel", True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 50, 32)),
                    jnp.float32)  # 50 % 4 != 0
    mha = MultiHeadAttention(opts=opts, embed_dim=32, num_heads=4)
    mesh = _mesh((2, 4), ("data", "model"))
    set_active_mesh(mesh)
    try:
        variables = mha.init({"params": jax.random.PRNGKey(0)}, x)
        f = jax.jit(lambda xx: mha.apply(variables, xx))
        y = f(x)
        assert "collective-permute" not in f.lower(x).compile().as_text()
    finally:
        set_active_mesh(None)
    assert y.shape == x.shape
