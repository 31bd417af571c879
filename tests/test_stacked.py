"""Species-stacked execution (models/stacked.py) vs the per-species loop.

The stacked path is a pure execution-layout change: batched dot_generals
over a [NS]-leading param stack instead of NS sequential nets. Forward
values match per species to float ulps (batched vs single dots may
re-associate), params round-trip exactly, and a multi-tick A2C run tracks
the per-species loop to tight tolerances with an identical integer
state trajectory (same sampled actions from the same per-species keys).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_bots_tpu.config import EnvConfig
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.learn.a2c import (init_stacked_train_state,
                                        init_train_states, make_train_tick)
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator
from madrona_bots_tpu.models.stacked import StackedActorCritic, stackable

NS = 4


@pytest.fixture(scope="module")
def models():
    gen = SpeciesNetGenerator(69, 6, 128, 16, seed=0)
    ms = [ActorCritic.from_generator(gen) for _ in range(NS)]
    # seed 0 exercises depth 1/2/3 and GRU/RNN/LSTM cells
    assert stackable([m.config for m in ms])
    return ms


@pytest.fixture(scope="module")
def params(models):
    key = jax.random.key(0)
    return [m.init(jax.random.fold_in(key, i))
            for i, m in enumerate(models)]


def test_params_roundtrip_exact(models, params):
    sac = StackedActorCritic(models)
    up = sac.unstack_params(sac.stack_params(params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(up)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_forward_matches_per_species(models, params):
    sac = StackedActorCritic(models)
    sp = sac.stack_params(params)
    B = 193
    obs = jax.random.normal(jax.random.key(1), (NS, B, 69))
    mem = jax.random.normal(jax.random.key(2), (NS, B, 16))
    lo, v, h = jax.jit(sac.forward)(sp, obs, mem)
    for s, m in enumerate(models):
        l2, v2, h2 = jax.jit(m.forward)(params[s], obs[s], mem[s])
        np.testing.assert_allclose(lo[s], l2, rtol=0, atol=1e-5)
        np.testing.assert_allclose(v[s], v2, rtol=0, atol=1e-5)
        np.testing.assert_allclose(h[s], h2, rtol=0, atol=1e-5)


def test_unstackable_config_rejected(models):
    bad = dict(models[0].config)
    bad["actor"] = bad["actor"][:1]
    assert not stackable([bad] + [m.config for m in models[1:]])


@pytest.mark.parametrize("proper", [False, True])
def test_stacked_tick_matches_loop(models, proper):
    cfg = EnvConfig(num_worlds=8, init_agents=8, max_agents=32)
    kw = dict(lr=1e-3, proper_log_probs=proper, use_pallas=False,
              learner_slots_per_class=4)
    tick_l, opt_l = make_train_tick(models, cfg, **kw)
    tick_s, opt_s = make_train_tick(models, cfg, stacked=True, **kw)
    ts_l = init_train_states(models, jax.random.key(1), opt_l)
    ts_s = init_stacked_train_state(models, jax.random.key(1), opt_s)
    sac = StackedActorCritic(models)

    # Same initial params by construction.
    for a, b in zip(jax.tree.leaves(
            tuple(ts.params for ts in ts_l)),
            jax.tree.leaves(tuple(sac.unstack_params(ts_s.params)))):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    st_l = init_state(jax.random.key(0), cfg)
    st_s = init_state(jax.random.key(0), cfg)
    key = jax.random.key(7)
    for t in range(4):
        k = jax.random.fold_in(key, t)
        st_l, ts_l, m_l = tick_l(st_l, ts_l, k)
        st_s, ts_s, m_s = tick_s(st_s, ts_s, k)
        # Integer state trajectory identical (same sampled actions).
        for f in ("alive", "species", "health", "action"):
            assert np.array_equal(np.asarray(getattr(st_l, f)),
                                  np.asarray(getattr(st_s, f))), (t, f)
        np.testing.assert_allclose(np.asarray(st_l.hidden),
                                   np.asarray(st_s.hidden),
                                   rtol=0, atol=2e-3)
        for kk in m_l:
            np.testing.assert_allclose(
                np.asarray(m_l[kk]), np.asarray(m_s[kk]), rtol=4e-3,
                atol=4e-3, err_msg=f"tick {t} metric {kk}")

    # Params track tightly after 4 Adam steps (chaotic drift bounded).
    for a, b in zip(jax.tree.leaves(tuple(ts.params for ts in ts_l)),
                    jax.tree.leaves(tuple(sac.unstack_params(ts_s.params)))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-3)
