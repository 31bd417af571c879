"""On-device A2C train tick tests."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_bots_tpu import EnvConfig, init_state
from madrona_bots_tpu.learn.a2c import (
    init_train_states, make_train_tick, rollout_train)
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator


def _setup(num_worlds=4, max_agents=64):
    cfg = EnvConfig(num_worlds=num_worlds, init_agents=32, max_agents=max_agents)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 32, cfg.hidden_state_dim, seed=0)
    models = [ActorCritic.from_generator(gen) for _ in range(cfg.num_species)]
    tick, opt = make_train_tick(models, cfg)
    tstates = init_train_states(models, jax.random.key(1), opt)
    state = init_state(jax.random.key(0), cfg)
    return cfg, models, tick, tstates, state


def test_train_tick_runs_and_updates():
    cfg, models, tick, tstates, state = _setup()
    p0 = jax.tree.map(jnp.copy, tstates[0].params)
    key = jax.random.key(2)
    for t in range(3):
        state, tstates, metrics = tick(state, tstates, jax.random.fold_in(key, t))
    # params changed
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         p0, tstates[0].params)
    assert max(jax.tree.leaves(diffs)) > 0
    # metrics finite and populations alive
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state.alive.sum()) > 0
    # actions written back are one-hot for alive agents
    acts = np.asarray(state.action)
    alive = np.asarray(state.alive)
    assert (acts[alive].sum(-1) == 1).all()
    assert (acts[~alive] == 0).all()
    # memory written back is nonzero for alive agents
    assert np.abs(np.asarray(state.hidden)[alive]).sum() > 0


def test_scan_rollout():
    cfg, models, tick, tstates, state = _setup(num_worlds=2, max_agents=64)
    state, tstates, metrics = rollout_train(tick, state, tstates,
                                            jax.random.key(3), 5)
    assert metrics["species_1_actor_loss"].shape == (5,)
    assert np.isfinite(np.asarray(metrics["species_1_total_loss"])).all()
    assert int(state.step_count) == 5


def test_bf16_compute_dtype():
    cfg, models, _, _, state = _setup(num_worlds=2, max_agents=64)
    tick, opt = make_train_tick(models, cfg, compute_dtype=jnp.bfloat16)
    tstates = init_train_states(models, jax.random.key(1), opt)
    state, tstates, metrics = tick(state, tstates, jax.random.key(2))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # master params stay f32
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(tstates[0].params))
