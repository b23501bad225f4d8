"""Mixture-of-Experts FFN + expert parallelism (modules/moe.py). Beyond-
reference feature (the reference has no MoE — SURVEY.md §2.3). Checks: the
one-hot dispatch/combine einsum math against a dense per-token oracle (no
capacity drops), capacity enforcement, the sown load-balance loss, the ViT
integration flag, the train step adding the aux loss, and expert-parallel
(dp x ep) execution matching the replicated run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _opts(extra=None):
    from cvnets_tpu.options.opts import get_training_arguments

    return get_training_arguments(args=[
        "--model.classification.name", "vit",
        "--dataset.category", "classification"] + (extra or []))


def _moe(e=4, k=2, cf=8.0, d=16, f=32):
    from cvnets_tpu.modules.moe import MoEFFN

    return MoEFFN(opts=_opts(), embed_dim=d, ffn_latent_dim=f,
                  num_experts=e, top_k=k, capacity_factor=cf)


def test_moe_ffn_matches_dense_oracle():
    """With capacity >= tokens (no drops), the einsum dispatch/combine must
    equal the dense mixture: y = sum_topk gate_i * FFN_i(x) / sum gates."""
    mod = _moe(e=4, k=2, cf=8.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6, 16)),
                    jnp.float32)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x)
    y, _ = mod.apply(variables, x, mutable=["moe_loss"])

    p = variables["params"]
    toks = x.reshape(-1, 16)
    logits = toks @ p["router"]["kernel"]
    probs = jax.nn.softmax(logits, axis=-1)

    def ffn(i, t):
        h = jax.nn.swish if False else None  # placeholder; act resolved below
        from cvnets_tpu.layers.activation import build_act_layer
        act = build_act_layer(mod.opts, act_name=None)
        h = act(t @ p["experts_fc1"][i] + p["experts_fc1_bias"][i][0])
        return h @ p["experts_fc2"][i] + p["experts_fc2_bias"][i][0]

    gold = []
    for ti in range(toks.shape[0]):
        pr = np.asarray(probs[ti])
        i1 = int(pr.argmax())
        pr2 = pr.copy()
        pr2[i1] = -1
        i2 = int(pr2.argmax())
        g1, g2 = pr[i1], pr[i2]
        yt = (g1 * ffn(i1, toks[ti]) + g2 * ffn(i2, toks[ti])) / (g1 + g2)
        gold.append(yt)
    gold = jnp.stack(gold).reshape(2, 6, 16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(gold),
                               atol=1e-5, rtol=1e-5)


def test_moe_capacity_drops_overflow():
    """capacity_factor small enough that some tokens overflow: dropped tokens
    produce zero output (the residual carries them); nothing NaNs."""
    mod = _moe(e=2, k=1, cf=0.25)  # cap = ceil(12*0.25/2) = 2 of 12 tokens
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 6, 16)),
                    jnp.float32)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x)
    y, _ = mod.apply(variables, x, mutable=["moe_loss"])
    toks = np.asarray(y).reshape(-1, 16)
    zero_rows = np.sum(np.all(toks == 0.0, axis=-1))
    assert zero_rows >= 12 - 2 * 2, f"expected >=8 dropped tokens, {zero_rows}"
    assert np.isfinite(toks).all()


def test_moe_aux_loss_sown():
    mod = _moe()
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 8, 16)),
                    jnp.float32)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x)
    _, nv = mod.apply({"params": variables["params"]}, x,
                      mutable=["moe_loss"])
    leaves = jax.tree_util.tree_leaves(nv["moe_loss"])
    assert len(leaves) == 1
    aux = float(leaves[0])
    # perfectly balanced routing gives 1.0; anything sane is near it
    assert 0.5 < aux < 4.0, aux


@pytest.mark.slow  # integration-weight: 67s under the fast tier's opt-0 XLA
def test_vit_moe_builds_and_aux_loss_trains():
    """--model.classification.vit.moe-num-experts wires MoE blocks into ViT;
    the train step adds the sown aux loss (weight on -> loss changes).
    Fast-tier MoE coverage stays via the dense-oracle/capacity/aux tests."""
    from cvnets_tpu.engine.train_state import create_train_state, make_train_step
    from cvnets_tpu.loss import build_loss_fn
    from cvnets_tpu.metrics.stats import Statistics
    from cvnets_tpu.models import get_model
    from cvnets_tpu.optim import build_optimizer

    # micro mode + period 1: both blocks are MoE; the wiring/aux-loss claim is
    # depth-independent and tiny's 12-block compile dominated the fast tier
    args = [
        "--model.classification.vit.mode", "micro",
        "--model.classification.vit.moe-num-experts", "4",
        "--model.classification.vit.moe-layer-period", "1",
        "--model.classification.n-classes", "8",
        "--loss.category", "classification",
        "--loss.classification.name", "cross_entropy",
        "--optim.name", "sgd", "--scheduler.name", "cosine",
    ]
    opts = _opts(args)
    model = get_model(opts)
    rng = jax.random.PRNGKey(0)
    batch = {
        "samples": np.random.default_rng(0)
        .standard_normal((2, 32, 32, 3)).astype(np.float32),
        "targets": np.array([1, 3], np.int32),
    }
    state = create_train_state(model, build_optimizer(opts), rng, batch,
                               ema_enabled=False)
    names = "/".join(jax.tree_util.tree_leaves(
        jax.tree_util.tree_map_with_path(
            lambda p, _: "/".join(getattr(k, "key", str(k)) for k in p),
            state.params)))
    assert "moe_ffn" in names and "experts_fc1" in names
    metrics = Statistics(opts, ["loss"]).metrics
    tx = build_optimizer(opts)
    step = jax.jit(make_train_step(model, build_loss_fn(opts), tx, opts,
                                   metrics))
    _, m1 = step(state, batch, 1e-3, rng)
    l1 = float(jax.device_get(m1)["loss"]["loss"][0])
    assert np.isfinite(l1)

    setattr(opts, "model.moe.aux_loss_weight", 0.0)
    step0 = jax.jit(make_train_step(model, build_loss_fn(opts), tx, opts,
                                    metrics))
    _, m0 = step0(state, batch, 1e-3, rng)
    l0 = float(jax.device_get(m0)["loss"]["loss"][0])
    assert l1 > l0, f"aux loss did not add: {l1} vs {l0}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow  # integration-weight: full-suite tier (fast-tier wall-clock diet, VERDICT r2 #7)
def test_expert_parallel_matches_replicated():
    """dp x ep on a (data=2, model=4) mesh: expert stacks shard over 'model'
    (sharding_rules), the f32 loss matches the replicated run to 1e-4."""
    from jax.sharding import Mesh

    from cvnets_tpu.engine.train_state import create_train_state, make_train_step
    from cvnets_tpu.loss import build_loss_fn
    from cvnets_tpu.metrics.stats import Statistics
    from cvnets_tpu.models import get_model
    from cvnets_tpu.optim import build_optimizer
    from cvnets_tpu.parallel import replicated_sharding, shard_batch
    from cvnets_tpu.parallel.mesh import set_active_mesh
    from cvnets_tpu.parallel.sharding_rules import shard_state_for_tp

    opts = _opts([
        "--model.classification.vit.mode", "tiny",
        "--model.classification.vit.moe-num-experts", "4",
        "--model.classification.vit.moe-layer-period", "3",
        "--model.classification.n-classes", "8",
        "--loss.category", "classification",
        "--loss.classification.name", "cross_entropy",
        "--optim.name", "sgd", "--scheduler.name", "cosine",
    ])
    model = get_model(opts)
    rng = jax.random.PRNGKey(0)
    batch = {
        "samples": np.random.default_rng(0)
        .standard_normal((8, 32, 32, 3)).astype(np.float32),
        "targets": (np.arange(8) % 8).astype(np.int32),
    }
    tx = build_optimizer(opts)
    state = create_train_state(model, tx, rng, batch, ema_enabled=False)
    metrics = Statistics(opts, ["loss"]).metrics
    step = make_train_step(model, build_loss_fn(opts), tx, opts, metrics)

    mesh_dp = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    st = jax.device_put(state, replicated_sharding(mesh_dp))
    _, m_dp = jax.jit(step)(st, shard_batch(mesh_dp, batch), 1e-3, rng)
    loss_dp = float(jax.device_get(m_dp)["loss"]["loss"][0])

    mesh_ep = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                   ("data", "model"))
    set_active_mesh(mesh_ep)
    try:
        st_ep = shard_state_for_tp(
            create_train_state(model, tx, rng, batch, ema_enabled=False),
            mesh_ep)
        experts = [p for path, p in jax.tree_util.tree_flatten_with_path(
            st_ep.params)[0]
            if "experts_fc1" in "/".join(getattr(k, "key", str(k))
                                         for k in path)]
        assert experts and all(
            e.addressable_shards[0].data.shape[0] == e.shape[0] // 4
            for e in experts), "expert stacks not sharded over the model axis"
        _, m_ep = jax.jit(step)(st_ep, shard_batch(mesh_ep, batch), 1e-3, rng)
        loss_ep = float(jax.device_get(m_ep)["loss"]["loss"][0])
    finally:
        set_active_mesh(None)
    assert abs(loss_ep - loss_dp) < 1e-4, (loss_ep, loss_dp)


@pytest.mark.slow
def test_moe_vit_learns_synthetic_task(tmp_path):
    """The MoE ViT must LEARN (router + experts + aux loss end-to-end through
    the real Trainer), not just run: same separable color task as
    test_learnability.py."""
    # Import under the SAME top-level name pytest collects the file as
    # (tests/ has no __init__.py, so `tests.test_learnability` would be a
    # second namespace-package module object and its register decorator would
    # run twice -> duplicate-registration ValueError in full-suite runs).
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).parent))
    import test_learnability  # noqa: F401 — registers synthetic_colors

    from cvnets_tpu.data.data_loaders import create_train_val_loader
    from cvnets_tpu.engine import Trainer
    from cvnets_tpu.loss import build_loss_fn
    from cvnets_tpu.models import get_model

    opts = _opts([
        "--dataset.name", "synthetic_colors",
        "--dataset.train-batch-size0", "2",
        "--dataset.val-batch-size0", "2",
        "--dataset.workers", "0",
        "--model.classification.vit.mode", "tiny",
        "--model.classification.vit.moe-num-experts", "4",
        "--model.classification.vit.moe-layer-period", "2",
        "--sampler.name", "batch_sampler",
        "--sampler.bs.crop-size-width", "32",
        "--sampler.bs.crop-size-height", "32",
        "--loss.category", "classification",
        "--optim.name", "adamw",
        "--scheduler.name", "cosine",
        "--scheduler.max-epochs", "3",
        "--common.log-freq", "8",
        "--common.results-loc", str(tmp_path),
    ])
    setattr(opts, "scheduler.cosine.max_lr", 0.002)
    setattr(opts, "scheduler.cosine.min_lr", 0.0005)
    setattr(opts, "stats.val", ["loss", "top1"])

    train_loader, val_loader, train_sampler = create_train_val_loader(opts)
    model = get_model(opts)
    criteria = build_loss_fn(opts)
    trainer = Trainer(opts=opts, model=model, criteria=criteria,
                      train_loader=train_loader, val_loader=val_loader,
                      train_sampler=train_sampler)
    trainer.run()
    val_stats = trainer.val_epoch(99)
    assert val_stats["top1"] > 75.0, val_stats
