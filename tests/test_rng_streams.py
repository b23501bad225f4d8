"""RNG-stream independence for the compiled train step (VERDICT r1 weak #9).

The Trainer holds ONE constant key; the jitted step derives per-step streams as
``fold_in(rng, state.step)`` then ``split(_, 3)`` → (mixup, augment, dropout)
(`cvnets_tpu/engine/train_state.py`). A reused stream here would silently
correlate augmentation with dropout, so pin the contract:

* different steps → different folded keys (no repetition across a run),
* the 3 split streams are pairwise distinct within and across steps,
* the derivation is deterministic (resume at step k reproduces step k's draws).
"""

import jax
import jax.numpy as jnp
import numpy as np


def _derive(rng, step):
    folded = jax.random.fold_in(rng, step)
    return jax.random.split(folded, 3)


def test_streams_distinct_within_and_across_steps():
    rng = jax.random.PRNGKey(0)
    seen = set()
    for step in range(64):
        for key in _derive(rng, step):
            seen.add(tuple(np.asarray(key).ravel().tolist()))
    assert len(seen) == 64 * 3  # no collisions anywhere


def test_derivation_deterministic_for_resume():
    rng = jax.random.PRNGKey(0)
    a = _derive(rng, 17)
    b = _derive(rng, 17)
    assert all(jnp.array_equal(x, y) for x, y in zip(a, b))


def test_draws_from_streams_are_uncorrelated():
    # cheap sanity: uniform draws from the three streams at one step should not
    # be equal elementwise (a reused key would make them identical)
    rng = jax.random.PRNGKey(0)
    mix, aug, drop = _derive(rng, 5)
    shape = (128,)
    u1 = jax.random.uniform(mix, shape)
    u2 = jax.random.uniform(aug, shape)
    u3 = jax.random.uniform(drop, shape)
    assert not jnp.allclose(u1, u2)
    assert not jnp.allclose(u2, u3)
    assert not jnp.allclose(u1, u3)
