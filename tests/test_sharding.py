"""Multi-device sharding tests on the virtual 8-CPU-device mesh.

Validates BASELINE config[3]'s logic without TPU hardware: worlds sharded,
params replicated, gradients psum'd by GSPMD, and — critically — that the
sharded trajectory matches the single-device trajectory exactly (world
independence means sharding must not change semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_bots_tpu import EnvConfig, init_state, step
from madrona_bots_tpu.env.env import set_actions
from madrona_bots_tpu.learn.a2c import init_train_states, make_train_tick
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator
from madrona_bots_tpu.parallel import (make_mesh, make_sharded_train_tick,
                                       shard_state)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_env_step_matches_single_device():
    cfg = EnvConfig(num_worlds=16, init_agents=32, max_agents=64)
    mesh = make_mesh()
    s_single = init_state(jax.random.key(0), cfg)
    s_shard = shard_state(jax.tree.map(jnp.copy, s_single), mesh)

    rng = np.random.default_rng(0)
    for _ in range(5):
        acts = rng.integers(0, 2, (16, 64, 6)).astype(np.int32)
        s_single = step(set_actions(s_single, jnp.array(acts)), cfg)
        s_shard = step(set_actions(s_shard, jnp.array(acts)), cfg)

    for f in ["alive", "species", "health", "food_count", "species_counts",
              "sensor_depth", "sensor_semantic", "finder"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(s_single, f)), np.asarray(getattr(s_shard, f)),
            err_msg=f)
    np.testing.assert_allclose(np.asarray(s_single.pos),
                               np.asarray(s_shard.pos), rtol=1e-6)


def test_sharded_train_tick_runs():
    cfg = EnvConfig(num_worlds=16, init_agents=32, max_agents=64)
    mesh = make_mesh()
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 32, cfg.hidden_state_dim, seed=0)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]
    tick, opt = make_sharded_train_tick(models, cfg, mesh)
    tstates = init_train_states(models, jax.random.key(1), opt)
    state = shard_state(init_state(jax.random.key(0), cfg), mesh)

    for t in range(2):
        state, tstates, metrics = tick(state, tstates,
                                       jax.random.fold_in(jax.random.key(2), t))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params must remain replicated (single shard spanning all devices)
    leaf = jax.tree.leaves(tstates[0].params)[0]
    assert leaf.sharding.is_fully_replicated
    # state stays worlds-sharded
    assert not state.pos.sharding.is_fully_replicated


def test_sharded_matches_unsharded_training():
    """Gradient math must be identical: replicated params, psum'd grads."""
    cfg = EnvConfig(num_worlds=8, init_agents=16, max_agents=32)
    mesh = make_mesh()
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 16, cfg.hidden_state_dim, seed=3)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]

    tick1, opt1 = make_train_tick(models, cfg)
    tickN, optN = make_sharded_train_tick(models, cfg, mesh)
    ts1 = init_train_states(models, jax.random.key(1), opt1)
    tsN = jax.tree.map(jnp.copy, ts1)
    s1 = init_state(jax.random.key(0), cfg)
    sN = shard_state(jax.tree.map(jnp.copy, s1), mesh)

    for t in range(2):
        k = jax.random.fold_in(jax.random.key(9), t)
        s1, ts1, m1 = tick1(s1, ts1, k)
        sN, tsN, mN = tickN(sN, tsN, k)

    # Sharded execution sums gradients as psum-of-partial-sums; the changed
    # reduction order shifts a few ulps which Adam's normalization amplifies
    # slightly — tolerance reflects that, not a semantic difference.
    for a, b in zip(jax.tree.leaves(ts1), jax.tree.leaves(tsN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(s1.alive), np.asarray(sN.alive))


def test_sharded_matches_unsharded_with_compaction_and_quirks():
    """The sharded tick must support the full single-chip feature set
    (learner-row compaction + quirk_compat) and stay equivalent: the
    compaction one-hot contraction is per-world, so worlds-sharding cannot
    change which rows are kept or what the learner batches contain."""
    cfg = EnvConfig(num_worlds=8, init_agents=16, max_agents=32)
    mesh = make_mesh()
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 16, cfg.hidden_state_dim, seed=4)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]

    kw = dict(quirk_compat=True, learner_slots_per_class=6)
    tick1, opt1 = make_train_tick(models, cfg, **kw)
    tickN, optN = make_sharded_train_tick(models, cfg, mesh, **kw)
    ts1 = init_train_states(models, jax.random.key(1), opt1)
    tsN = jax.tree.map(jnp.copy, ts1)
    s1 = init_state(jax.random.key(0), cfg)
    sN = shard_state(jax.tree.map(jnp.copy, s1), mesh)

    for t in range(2):
        k = jax.random.fold_in(jax.random.key(9), t)
        s1, ts1, m1 = tick1(s1, ts1, k)
        sN, tsN, mN = tickN(sN, tsN, k)

    for s in range(4):
        assert float(m1[f"species_{s+1}_dropped_rows"]) == \
            float(mN[f"species_{s+1}_dropped_rows"])
    for a, b in zip(jax.tree.leaves(ts1), jax.tree.leaves(tsN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(s1.alive), np.asarray(sN.alive))
    np.testing.assert_array_equal(np.asarray(s1.action), np.asarray(sN.action))
