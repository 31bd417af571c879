"""PPO trainer tests (small shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_bots_tpu import EnvConfig, init_state
from madrona_bots_tpu.learn.a2c import init_train_states
from madrona_bots_tpu.learn.ppo import make_ppo_trainer
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator


def test_ppo_iteration_runs_and_updates():
    cfg = EnvConfig(num_worlds=2, init_agents=16, max_agents=32)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 16, cfg.hidden_state_dim, seed=0)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]
    ppo_iter, opt = make_ppo_trainer(models, cfg, rollout_len=4,
                                     num_minibatches=2, update_epochs=1)
    tstates = init_train_states(models, jax.random.key(1), opt)
    state = init_state(jax.random.key(0), cfg)
    p0 = jax.tree.map(jnp.copy, tstates[0].params)

    for t in range(2):
        state, tstates, metrics = ppo_iter(state, tstates,
                                           jax.random.fold_in(jax.random.key(2), t))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         p0, tstates[0].params)
    assert max(jax.tree.leaves(diffs)) > 0
    assert int(state.step_count) == 8  # 2 iterations x 4 rollout steps
    assert int(state.alive.sum()) > 0


def test_ppo_learner_compaction_matches_full():
    """learner_slots_per_class with a single minibatch: the compacted update
    sees exactly the same masked transition set as the full padded update
    (the one-hot gather is exact; only the summation ORDER inside the loss
    reductions changes), so losses and updated params agree to reassociation
    ulps and the dropped-row counter stays zero. With multiple minibatches
    the partition composition legitimately differs — the guarantee is
    same-transitions, not same-grouping."""
    import numpy as np
    from madrona_bots_tpu.env.state import init_state
    from madrona_bots_tpu.learn.a2c import init_train_states
    from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator

    cfg = EnvConfig(num_worlds=4, init_agents=16, max_agents=32)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 16, cfg.hidden_state_dim, seed=0)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]

    outs = []
    for slots in (None, 6):
        it, opt = make_ppo_trainer(models, cfg, rollout_len=2,
                                   num_minibatches=1, update_epochs=1,
                                   learner_slots_per_class=slots)
        ts = init_train_states(models, jax.random.key(1), opt)
        state = init_state(jax.random.key(0), cfg)
        state, ts, m = it(state, ts, jax.random.key(2))
        outs.append((ts, m))

    (ts_full, m_full), (ts_c, m_c) = outs
    for i in range(1, 5):
        assert float(m_c[f"species_{i}_dropped_rows"]) == 0.0
        np.testing.assert_allclose(float(m_c[f"species_{i}_loss"]),
                                   float(m_full[f"species_{i}_loss"]),
                                   rtol=2e-4)
    for a, b in zip(jax.tree.leaves(ts_full), jax.tree.leaves(ts_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_ppo_compact_rollout_runs():
    """Record-compacted iteration runs end to end (multi-minibatch) and
    every alive agent receives an action for the next step."""
    import numpy as np
    from madrona_bots_tpu.env.state import init_state
    from madrona_bots_tpu.learn.a2c import init_train_states
    from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator

    cfg = EnvConfig(num_worlds=2, init_agents=16, max_agents=32)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 16, cfg.hidden_state_dim, seed=0)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]
    it, opt = make_ppo_trainer(models, cfg, rollout_len=3, num_minibatches=2,
                               update_epochs=1, learner_slots_per_class=6)
    ts = init_train_states(models, jax.random.key(1), opt)
    state = init_state(jax.random.key(0), cfg)
    state, ts, m = it(state, ts, jax.random.key(2))
    for i in range(1, 5):
        assert np.isfinite(float(m[f"species_{i}_loss"]))
        assert float(m[f"species_{i}_dropped_rows"]) == 0.0
    # every alive agent got an action written for the next step
    acts = np.asarray(state.action).sum(-1) > 0
    alive = np.asarray(state.alive)
    # agents act only if they were alive when actions were written (some
    # died/respawned in the last env step) — sanity: action rows are a
    # subset of capacity and nonzero
    assert acts.sum() > 0 and (acts <= np.ones_like(alive)).all()


def test_ppo_compaction_never_changes_trajectories():
    """Record compaction is a learner-batch optimization ONLY: even with a
    cap small enough to overflow (dropped rows counted), every alive agent
    still acts with its sampled action and the post-iteration sim state is
    BIT-IDENTICAL to the uncompacted trainer's on the same seed."""
    cfg = EnvConfig(num_worlds=2, init_agents=32, max_agents=32)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 16, cfg.hidden_state_dim, seed=0)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]
    cap = 2  # Asub = 8 slots/class, ~8 alive/class -> guaranteed overflow
    states = []
    for slots in (cap, None):
        it, opt = make_ppo_trainer(models, cfg, rollout_len=2,
                                   num_minibatches=1, update_epochs=1,
                                   learner_slots_per_class=slots)
        ts = init_train_states(models, jax.random.key(1), opt)
        state = init_state(jax.random.key(0), cfg)
        state, ts, m = it(state, ts, jax.random.key(2))
        states.append(state)
        if slots == cap:
            assert sum(float(m[f"species_{i}_dropped_rows"])
                       for i in range(1, 5)) > 0
    sc, sf = states
    for a, b in zip(jax.tree.leaves(sc), jax.tree.leaves(sf)):
        if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ppo_pack_kernel_matches_einsum_path():
    """The fused Pallas row-gather record pack (MBOTS_PACK_KERNEL=1, bf16
    mode) must produce a BIT-IDENTICAL PPO iteration to the einsum payload
    path: same params, same state, same metrics."""
    import os
    cfg = EnvConfig(num_worlds=2, init_agents=16, max_agents=32)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 16, cfg.hidden_state_dim, seed=7)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]

    outs = []
    for knob in ("1", "0"):
        os.environ["MBOTS_PACK_KERNEL"] = knob
        try:
            it, opt = make_ppo_trainer(models, cfg, rollout_len=3,
                                       num_minibatches=2, update_epochs=1,
                                       compute_dtype=jnp.bfloat16,
                                       learner_slots_per_class=5)
            ts = init_train_states(models, jax.random.key(1), opt)
            state = init_state(jax.random.key(0), cfg)
            for t in range(2):
                state, ts, m = it(state, ts,
                                  jax.random.fold_in(jax.random.key(2), t))
            outs.append((state, ts, m))
        finally:
            os.environ.pop("MBOTS_PACK_KERNEL", None)

    (s0, t0, m0), (s1, t1, m1) = outs
    for a, b in zip(jax.tree.leaves(t0), jax.tree.leaves(t1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(s0.pos), np.asarray(s1.pos))
    np.testing.assert_array_equal(np.asarray(s0.hidden), np.asarray(s1.hidden))
    for k in m0:
        np.testing.assert_array_equal(np.asarray(m0[k]), np.asarray(m1[k]), k)
