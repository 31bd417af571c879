"""Stacked PPO (learn/ppo.py stacked=True) vs the per-species loop, plus the
flattened-optimizer state stack/unstack round trip (models/stacked.py).

The stacked PPO path batches the rollout forwards AND the minibatch update
phase over the species axis. Behavioral contract: identical integer state
trajectory (same sampled actions from the same per-species streams),
per-species metrics within float-association tolerances, and params tracking
the loop's across iterations. Gradient clipping is verified per species
(per_species_clip_by_global_norm vs optax.clip_by_global_norm per tree).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from madrona_bots_tpu.config import EnvConfig
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.learn.a2c import (init_stacked_train_state,
                                        init_train_states, make_optimizer)
from madrona_bots_tpu.learn.ppo import (make_ppo_optimizer,
                                        make_ppo_trainer,
                                        make_stacked_ppo_optimizer)
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator
from madrona_bots_tpu.models.stacked import (StackedActorCritic,
                                             per_species_clip_by_global_norm)

NS = 4


@pytest.fixture(scope="module")
def models():
    gen = SpeciesNetGenerator(69, 6, 128, 16, seed=0)
    return [ActorCritic.from_generator(gen) for _ in range(NS)]


@pytest.fixture(scope="module")
def params(models):
    key = jax.random.key(0)
    return [m.init(jax.random.fold_in(key, i))
            for i, m in enumerate(models)]


def test_opt_state_roundtrip_exact(models, params):
    """Per-species flattened Adam states -> stacked -> back, bit-exact.

    Moments are made non-trivial by applying one real gradient-sized update
    per species before converting."""
    sac = StackedActorCritic(models)
    opt = make_optimizer(1e-3)
    states = []
    for s, p in enumerate(params):
        st = opt.init(p)
        g = jax.tree.map(
            lambda x: jax.random.normal(jax.random.key(7 + s), x.shape),
            p)
        _, st = opt.update(g, st, p)
        states.append(st)
    sp = sac.stack_params(params)
    st_stacked = sac.stack_opt_state(states, params, sp)
    back = sac.unstack_opt_state(st_stacked, params, sp)
    for a, b in zip(jax.tree.leaves(tuple(states)),
                    jax.tree.leaves(tuple(back))):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_ppo_opt_state_roundtrip_exact(models, params):
    """Same round trip through the PPO optimizer pair (clip + flatten adam);
    the per-species and stacked state structures convert both ways."""
    sac = StackedActorCritic(models)
    opt_l = make_ppo_optimizer(3e-4)
    states = []
    for s, p in enumerate(params):
        st = opt_l.init(p)
        g = jax.tree.map(
            lambda x: 0.01 * jax.random.normal(jax.random.key(3 + s),
                                               x.shape), p)
        _, st = opt_l.update(g, st, p)
        states.append(st)
    sp = sac.stack_params(params)
    opt_s = make_stacked_ppo_optimizer(NS, 3e-4)
    st_stacked = sac.stack_opt_state(states, params, sp)
    # the stacked state must be structurally valid for the stacked optimizer
    ref = opt_s.init(sp)
    assert (jax.tree.structure(st_stacked) == jax.tree.structure(ref))
    back = sac.unstack_opt_state(st_stacked, params, sp)
    for a, b in zip(jax.tree.leaves(tuple(states)),
                    jax.tree.leaves(tuple(back))):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_per_species_clip_matches_loop(models, params):
    """per_species_clip_by_global_norm == optax.clip_by_global_norm applied
    per species tree (to norm-summation-order tolerance), including the
    triggered (norm > max) branch."""
    sac = StackedActorCritic(models)
    grads = [jax.tree.map(
        lambda x: 3.0 * jax.random.normal(jax.random.key(11 + s), x.shape),
        p) for s, p in enumerate(params)]
    gst = sac.stack_params(grads)
    clip_s = per_species_clip_by_global_norm(0.5, NS)
    out_st, _ = clip_s.update(gst, clip_s.init(gst))
    outs = sac.unstack_params(out_st)
    clip_l = optax.clip_by_global_norm(0.5)
    for s in range(NS):
        ref, _ = clip_l.update(grads[s], clip_l.init(grads[s]))
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(outs[s])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_stacked_ppo_matches_loop(models):
    cfg = EnvConfig(num_worlds=8, init_agents=8, max_agents=32)
    kw = dict(rollout_len=4, num_minibatches=2, update_epochs=2,
              use_pallas=False, learner_slots_per_class=4)
    it_l, opt_l = make_ppo_trainer(models, cfg, **kw)
    it_s, opt_s = make_ppo_trainer(models, cfg, stacked=True, **kw)
    ts_l = init_train_states(models, jax.random.key(1), opt_l)
    ts_s = init_stacked_train_state(models, jax.random.key(1), opt_s)
    sac = StackedActorCritic(models)

    st_l = init_state(jax.random.key(0), cfg)
    st_s = init_state(jax.random.key(0), cfg)
    key = jax.random.key(9)
    for t in range(3):
        k = jax.random.fold_in(key, t)
        st_l, ts_l, m_l = it_l(st_l, ts_l, k)
        st_s, ts_s, m_s = it_s(st_s, ts_s, k)
        for f in ("alive", "species", "health", "action"):
            assert np.array_equal(np.asarray(getattr(st_l, f)),
                                  np.asarray(getattr(st_s, f))), (t, f)
        # 12 recurrent env steps across 3 iterations accumulate more float
        # drift than the 4-tick A2C test; the integer trajectory above is
        # the hard equality gate.
        np.testing.assert_allclose(np.asarray(st_l.hidden),
                                   np.asarray(st_s.hidden),
                                   rtol=0, atol=2e-2)
        assert set(m_l) == set(m_s)
        for kk in m_l:
            np.testing.assert_allclose(
                np.asarray(m_l[kk]), np.asarray(m_s[kk]), rtol=5e-3,
                atol=5e-3, err_msg=f"iter {t} metric {kk}")

    for a, b in zip(jax.tree.leaves(tuple(ts.params for ts in ts_l)),
                    jax.tree.leaves(tuple(sac.unstack_params(ts_s.params)))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-3)
