"""Legacy (non-recurrent) model family tests (reference learn/model.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_bots_tpu.models.legacy import (LegacyActorCritic,
                                            LegacySpeciesNetGenerator,
                                            discounted_returns, legacy_loss)


def test_legacy_forward():
    gen = LegacySpeciesNetGenerator(69, 6, 32, seed=0)
    m = LegacyActorCritic.from_generator(gen)
    params = m.init(jax.random.key(0))
    logits, v = m.forward(params, jnp.ones((7, 69)))
    assert logits.shape == (7, 6) and v.shape == (7,)
    assert np.isfinite(np.asarray(logits)).all()


def test_discounted_returns():
    r = jnp.array([1.0, 0.0, 2.0])
    g = discounted_returns(r, gamma=0.5, normalize=False)
    np.testing.assert_allclose(np.asarray(g), [1 + 0.5 * 0 + 0.25 * 2, 1.0, 2.0])
    gn = discounted_returns(r, gamma=0.5, normalize=True)
    np.testing.assert_allclose(float(gn.mean()), 0.0, atol=1e-6)


def test_legacy_loss():
    logp = jnp.array([0.1, -0.2])
    g = jnp.array([1.0, -1.0])
    v = jnp.array([0.5, 0.5])
    actor, critic = legacy_loss(logp, g, v)
    adv = np.asarray(g) - np.asarray(v)
    np.testing.assert_allclose(float(actor), -(np.asarray(logp) * adv).sum(),
                               rtol=1e-6)
    assert float(critic) > 0


def test_legacy_env_driver_runs():
    """The legacy headless loop (learn/env.py parity) end to end, tiny."""
    from madrona_bots_tpu.learn import env as legacy_env
    legacy_env.main(["--num_worlds", "2", "--num_epochs", "2",
                     "--hidden_dim", "16"])
