"""Pipeline parallelism (GPipe microbatching over the 'pipe' mesh axis).
Beyond-reference feature — the reference (SURVEY.md §2.8) is replicated DDP
only. Checks: math identity with the sequential block stack (fwd + grads,
real TransformerEncoder blocks), composition with data parallelism on a
(data, pipe) mesh, and the collective-permute signature (activations hop
stages over ICI; no all-gather of the stacked block params)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _mesh(shape, names):
    return Mesh(np.asarray(jax.devices()[:8]).reshape(shape), names)


def _block_stack(l=8, e=32, seed=0):
    """A real L-deep TransformerEncoder stack with stacked params."""
    from cvnets_tpu.modules.transformer import TransformerEncoder
    from cvnets_tpu.options.opts import get_training_arguments
    from cvnets_tpu.parallel.pipeline import stack_block_params

    opts = get_training_arguments(args=[
        "--model.classification.name", "vit",
        "--dataset.category", "classification"])
    block = TransformerEncoder(opts=opts, embed_dim=e, ffn_latent_dim=2 * e,
                               num_heads=4)
    x0 = jnp.zeros((1, 8, e), jnp.float32)
    plist = [block.init({"params": jax.random.PRNGKey(seed + i)}, x0)["params"]
             for i in range(l)]
    stacked = stack_block_params(plist)
    block_fn = lambda p, h: block.apply({"params": p}, h)
    return block_fn, stacked


def _sequential(block_fn, stacked, x):
    def body(h, p):
        return block_fn(p, h), None
    y, _ = jax.lax.scan(body, x, stacked)
    return y


def test_pipeline_matches_sequential():
    from cvnets_tpu.parallel.pipeline import pipeline_blocks

    mesh = _mesh((8,), ("pipe",))
    block_fn, stacked = _block_stack()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((16, 8, 32)),
                    jnp.float32)

    for m in (8, 16):  # microbatch counts: P and 2P
        y_pipe = jax.jit(lambda p, xx: pipeline_blocks(
            p, xx, block_fn, mesh, num_microbatches=m))(stacked, x)
        y_seq = jax.jit(lambda p, xx: _sequential(block_fn, p, xx))(stacked, x)
        np.testing.assert_allclose(np.asarray(y_pipe), np.asarray(y_seq),
                                   atol=1e-5)

    def loss_pipe(p, xx):
        return jnp.sum(pipeline_blocks(p, xx, block_fn, mesh) ** 2)

    def loss_seq(p, xx):
        return jnp.sum(_sequential(block_fn, p, xx) ** 2)

    g1 = jax.jit(jax.grad(loss_pipe))(stacked, x)
    g2 = jax.jit(jax.grad(loss_seq))(stacked, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_pipeline_composes_with_dp():
    """(data=2, pipe=4): batch shards over data, stages over pipe; the block
    params must stay sharded (no all-gather of the stacked stack) and the
    stage hops must be collective-permutes."""
    from cvnets_tpu.parallel.pipeline import pipeline_blocks

    mesh = _mesh((2, 4), ("data", "pipe"))
    block_fn, stacked = _block_stack()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 8, 32)),
                    jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ps = jax.device_put(stacked, NamedSharding(mesh, P("pipe")))

    f = jax.jit(lambda p, xx: pipeline_blocks(
        p, xx, block_fn, mesh, num_microbatches=4, data_axis="data"),
        out_shardings=NamedSharding(mesh, P("data")))
    y = f(ps, xs)
    y_seq = _sequential(block_fn, stacked, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_seq), atol=1e-5)
    txt = f.lower(ps, xs).compile().as_text()
    assert "collective-permute" in txt
    # 8 blocks x (mha qkv+out + 2 ffn) of 32x32-ish params: an all-gathered
    # stack would show an all-gather over the full leading dim
    assert "all-gather" not in txt, "stacked block params were all-gathered"


def test_pipeline_rejects_bad_divisibility():
    from cvnets_tpu.parallel.pipeline import pipeline_blocks

    mesh = _mesh((8,), ("pipe",))
    block_fn, stacked = _block_stack(l=8)
    x = jnp.zeros((6, 8, 32), jnp.float32)  # 6 % 8 != 0
    with pytest.raises(AssertionError):
        pipeline_blocks(stacked, x, block_fn, mesh)
