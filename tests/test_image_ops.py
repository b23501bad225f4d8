"""Device-tier augmentation op tests (rand-augment, erasing, mixup/cutmix)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _images(n=4, h=16, w=16):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32))


def test_rand_augment_shapes_and_range():
    from cvnets_tpu.ops.image_ops import rand_augment

    x = _images()
    y = jax.jit(lambda r, x: rand_augment(r, x))(jax.random.PRNGKey(0), x)
    assert y.shape == x.shape
    assert jnp.isfinite(y).all()
    assert float(y.min()) >= -1e-5 and float(y.max()) <= 1.0 + 1e-5


def test_trivial_augment_and_erasing():
    from cvnets_tpu.ops.image_ops import random_erasing, trivial_augment_wide

    x = _images()
    y = jax.jit(trivial_augment_wide)(jax.random.PRNGKey(1), x)
    assert y.shape == x.shape and jnp.isfinite(y).all()
    z = jax.jit(lambda r, x: random_erasing(r, x, p=1.0))(jax.random.PRNGKey(2), x)
    assert z.shape == x.shape
    # with p=1 at least one pixel must differ per image
    diff = jnp.abs(z - x).sum(axis=(1, 2, 3))
    assert (diff > 0).all()


def test_geometric_ops_identity_at_zero():
    from cvnets_tpu.ops.image_ops import rotate, shear_x, translate_x

    x = _images(1)[0]
    assert jnp.allclose(rotate(x, 0.0), x, atol=1e-5)
    assert jnp.allclose(shear_x(x, 0.0), x, atol=1e-5)
    assert jnp.allclose(translate_x(x, 0.0), x, atol=1e-5)


def test_mixup_soft_targets_sum_to_one():
    from cvnets_tpu.ops.mixing import cutmix, mixup

    x = _images()
    y = jnp.asarray([0, 1, 2, 3])
    mx, my = mixup(jax.random.PRNGKey(0), x, y, 5, alpha=0.2)
    assert mx.shape == x.shape and my.shape == (4, 5)
    assert jnp.allclose(my.sum(-1), 1.0, atol=1e-5)
    cx, cy = cutmix(jax.random.PRNGKey(1), x, y, 5, alpha=1.0)
    assert cx.shape == x.shape
    assert jnp.allclose(cy.sum(-1), 1.0, atol=1e-5)


def test_neural_augmentor_params_and_range():
    import argparse

    from cvnets_tpu.models.neural_augmentor.neural_aug import NeuralAugmentor

    opts = argparse.Namespace()
    setattr(opts, "model.learn_augmentation.mode", "distribution")
    setattr(opts, "model.learn_augmentation.brightness", True)
    setattr(opts, "model.learn_augmentation.contrast", True)
    setattr(opts, "model.learn_augmentation.noise", False)
    m = NeuralAugmentor(opts=opts, mode="distribution")
    x = _images()
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               x, training=True)
    names = set(v["params"].keys())
    assert {"brightness_min", "brightness_max", "contrast_min",
            "contrast_max"} <= names
    y = m.apply(v, x, training=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert y.shape == x.shape
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
    # eval passes through
    assert jnp.allclose(m.apply(v, x, training=False), x)
