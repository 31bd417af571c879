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


def test_a2c_learner_compaction_matches_full():
    """learner_slots_per_class on the A2C tick: when the cap covers every
    alive agent, the compacted update equals the padded update to
    reassociation ulps (the one-hot gather/scatter is exact) and the
    write-back covers the same action rows; dropped counter stays zero."""
    import numpy as np
    from madrona_bots_tpu.config import EnvConfig
    from madrona_bots_tpu.env.state import init_state
    from madrona_bots_tpu.learn.a2c import init_train_states, make_train_tick
    from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator

    cfg = EnvConfig(num_worlds=4, init_agents=16, max_agents=32)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 16, cfg.hidden_state_dim, seed=0)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]

    outs = []
    for L in (None, 6):
        tick, opt = make_train_tick(models, cfg, learner_slots_per_class=L)
        ts = init_train_states(models, jax.random.key(1), opt)
        state = init_state(jax.random.key(0), cfg)
        state, ts, m = tick(state, ts, jax.random.key(2))
        outs.append((state, ts, m))

    (s0, t0, m0), (s1, t1, m1) = outs
    for i in range(1, 5):
        assert float(m1[f"species_{i}_dropped_rows"]) == 0.0
        for k in ("count", "reward", "avg_health"):
            np.testing.assert_allclose(float(m0[f"species_{i}_{k}"]),
                                       float(m1[f"species_{i}_{k}"]),
                                       rtol=1e-6)
        np.testing.assert_allclose(float(m0[f"species_{i}_total_loss"]),
                                   float(m1[f"species_{i}_total_loss"]),
                                   rtol=2e-4)
    assert (int((np.asarray(s1.action).sum(-1) > 0).sum())
            == int((np.asarray(s0.action).sum(-1) > 0).sum()))
    for a, b in zip(jax.tree.leaves(t0), jax.tree.leaves(t1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_a2c_pack_kernel_matches_einsum_path():
    """The fused Pallas row-gather pack path (MBOTS_PACK_KERNEL=1, bf16
    compacting mode) must produce the BIT-IDENTICAL tick to the einsum
    payload path: same new params, same written-back actions/memory, same
    metrics."""
    import os
    from madrona_bots_tpu.config import EnvConfig
    from madrona_bots_tpu.env.state import init_state
    from madrona_bots_tpu.learn.a2c import init_train_states, make_train_tick
    from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator

    cfg = EnvConfig(num_worlds=4, init_agents=16, max_agents=32)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 16, cfg.hidden_state_dim, seed=3)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]

    outs = []
    for knob in ("1", "0"):
        os.environ["MBOTS_PACK_KERNEL"] = knob
        try:
            tick, opt = make_train_tick(models, cfg,
                                        learner_slots_per_class=5,
                                        compute_dtype=jnp.bfloat16)
            ts = init_train_states(models, jax.random.key(1), opt)
            state = init_state(jax.random.key(0), cfg)
            for t in range(2):
                state, ts, m = tick(state, ts,
                                    jax.random.fold_in(jax.random.key(2), t))
            outs.append((state, ts, m))
        finally:
            os.environ.pop("MBOTS_PACK_KERNEL", None)

    (s0, t0, m0), (s1, t1, m1) = outs
    for a, b in zip(jax.tree.leaves(t0), jax.tree.leaves(t1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(s0.action), np.asarray(s1.action))
    np.testing.assert_array_equal(np.asarray(s0.hidden), np.asarray(s1.hidden))
    for k in m0:
        np.testing.assert_array_equal(np.asarray(m0[k]), np.asarray(m1[k]), k)


def test_a2c_pack_kernel_quirk_compat_matches():
    """Same bit-identity with quirk_compat observations (Q1 semantic-byte
    depth block, Q2 bit-reinterpreted health)."""
    import os
    from madrona_bots_tpu.config import EnvConfig
    from madrona_bots_tpu.env.state import init_state
    from madrona_bots_tpu.learn.a2c import init_train_states, make_train_tick
    from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator

    cfg = EnvConfig(num_worlds=2, init_agents=16, max_agents=32)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 16, cfg.hidden_state_dim, seed=5)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]

    outs = []
    for knob in ("1", "0"):
        os.environ["MBOTS_PACK_KERNEL"] = knob
        try:
            tick, opt = make_train_tick(models, cfg,
                                        learner_slots_per_class=5,
                                        quirk_compat=True,
                                        compute_dtype=jnp.bfloat16)
            ts = init_train_states(models, jax.random.key(1), opt)
            state = init_state(jax.random.key(0), cfg)
            state, ts, m = tick(state, ts, jax.random.key(2))
            outs.append((state, ts, m))
        finally:
            os.environ.pop("MBOTS_PACK_KERNEL", None)

    (s0, t0, m0), (s1, t1, m1) = outs
    for a, b in zip(jax.tree.leaves(t0), jax.tree.leaves(t1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(s0.hidden), np.asarray(s1.hidden))
