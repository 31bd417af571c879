"""Reference-bug emulation toggles (SPEC deviations D1/D3/D4, quirks Q1/Q2).

Each quirk flag flips BOTH the vectorized env and the oracle into the
reference's buggy behavior; parity must hold in quirk mode exactly as in
fixed mode, and the quirk must actually change behavior vs the fixed config
(otherwise the toggle is dead).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_bots_tpu import EnvConfig, init_state, step
from madrona_bots_tpu.env.env import set_actions, shift_observations
from madrona_bots_tpu.oracle.oracle import Oracle


def directed_actions(rng, W, A):
    acts = np.zeros((W, A, 6), np.int32)
    a = rng.integers(0, 6, (W, A))
    acts[np.arange(W)[:, None], np.arange(A)[None, :], a] = 1
    acts[:, :, 4] |= rng.integers(0, 2, (W, A)).astype(np.int32)  # shoot
    acts[:, :, 5] |= rng.integers(0, 2, (W, A)).astype(np.int32)  # breed
    return acts


def run_parity(cfg, seed=5, steps=20, shift_every=3):
    key = jax.random.key(seed)
    state = init_state(key, cfg)
    oracle = Oracle(key, cfg)
    rng = np.random.default_rng(seed)
    for t in range(steps):
        acts = directed_actions(rng, cfg.num_worlds, cfg.max_agents)
        state = step(set_actions(state, jnp.array(acts)), cfg)
        oracle.step(acts)
        if t % shift_every == 0:
            state = shift_observations(state, cfg)
            oracle.shift_observations()
        for f in ["alive", "species", "health", "stats", "finder",
                  "prev_stats", "food_count"]:
            np.testing.assert_array_equal(
                np.asarray(getattr(state, f)), oracle.field(f),
                err_msg=f"step {t} field {f}")
        np.testing.assert_allclose(
            np.asarray(state.reward), oracle.field("reward"),
            rtol=1e-5, atol=1e-4, err_msg=f"step {t} reward")
    return state


def run_env(cfg, seed=5, steps=20):
    state = init_state(jax.random.key(seed), cfg)
    rng = np.random.default_rng(seed)
    for _ in range(steps):
        acts = directed_actions(rng, cfg.num_worlds, cfg.max_agents)
        state = step(set_actions(state, jnp.array(acts)), cfg)
    return state


@pytest.mark.parametrize("quirk", ["d1", "d3", "d4"])
def test_quirk_parity_vs_oracle(quirk):
    kwargs = {f"quirk_{quirk}_" + {"d1": "stale_finder", "d3": "oob_reward",
                                   "d4": "shift_typo"}[quirk]: True}
    cfg = EnvConfig(num_worlds=2, init_agents=32, max_agents=48, **kwargs)
    run_parity(cfg)


def test_quirk_d1_is_provably_vacuous():
    """D1's liveness check cannot fire in reachable states: the sensor pass
    runs LAST in every step, so `finder` only ever references slots alive in
    the exact alive-set the next step's action system reads (deaths happen
    before the sensor; nothing dies between steps). The toggle exists for
    API completeness; this pins the equivalence so a future reordering of
    the step graph would surface here."""
    base = EnvConfig(num_worlds=2, init_agents=32, max_agents=48)
    q = EnvConfig(num_worlds=2, init_agents=32, max_agents=48,
                  quirk_d1_stale_finder=True)
    s0 = run_env(base)
    s1 = run_env(q)
    for f in ["alive", "species", "health", "stats", "finder", "reward"]:
        np.testing.assert_array_equal(np.asarray(getattr(s0, f)),
                                      np.asarray(getattr(s1, f)), err_msg=f)


def test_quirk_d3_changes_rewards():
    base = EnvConfig(num_worlds=2, init_agents=32, max_agents=48)
    q = EnvConfig(num_worlds=2, init_agents=32, max_agents=48,
                  quirk_d3_oob_reward=True)
    s0 = run_env(base, steps=6)
    s1 = run_env(q, steps=6)
    # Same dynamics (reward does not feed back), different reward values.
    np.testing.assert_array_equal(np.asarray(s0.alive), np.asarray(s1.alive))
    assert not np.allclose(np.asarray(s0.reward), np.asarray(s1.reward))


def test_quirk_d4_changes_prev_stats():
    q = EnvConfig(num_worlds=2, init_agents=32, max_agents=48,
                  quirk_d4_shift_typo=True)
    state = run_env(q, steps=10)
    state = shift_observations(state, q)
    ps = np.asarray(state.prev_stats)
    np.testing.assert_array_equal(ps[..., 1], ps[..., 0])


def test_quirk_d1_fused_kernel_parity():
    from madrona_bots_tpu.env.env import step_systems, sensor_pass
    from madrona_bots_tpu.ops.step_pallas import fused_step_systems
    cfg = EnvConfig(num_worlds=2, init_agents=32, max_agents=48,
                    quirk_d1_stale_finder=True)
    s_ref = init_state(jax.random.key(7), cfg)
    s_k = jax.tree.map(jnp.copy, s_ref)
    rng = np.random.default_rng(7)
    for t in range(10):
        acts = jnp.array(directed_actions(rng, 2, 48))
        s_ref = sensor_pass(step_systems(set_actions(s_ref, acts), cfg), cfg)
        s_k = sensor_pass(
            fused_step_systems(set_actions(s_k, acts), cfg, interpret=True),
            cfg)
        for f in ["alive", "species", "health", "stats", "finder"]:
            np.testing.assert_array_equal(
                np.asarray(getattr(s_ref, f)), np.asarray(getattr(s_k, f)),
                err_msg=f"step {t} field {f}")


def test_manager_q2_health_bitcast():
    from madrona_bots_tpu.api import SimManager
    mgr = SimManager(0, 2, 3, 16, quirk_compat=True)
    mgr.step()
    h = mgr.health_tensor(False).to_numpy()
    assert h.dtype == np.float32
    ints = h.view(np.int32)
    # bit-reinterpreted int32 healths: integer bit patterns, not values
    assert ints.max() <= 200 and ints.min() >= 0
    mgr2 = SimManager(0, 2, 3, 16, quirk_compat=False)
    mgr2.step()
    h2 = mgr2.health_tensor(False).to_numpy()
    assert h2.max() > 1.0  # real float values (e.g. 100.0)


def test_quirk_inloop_shift_matches_sequenced_reference_ordering():
    """Q8 (VERDICT r3 item 8): the reference calls shift_observations()
    inside the species loop (training_loop.py:135-137), before each
    species' action/memory writes. The quirk tick
    (make_train_tick(quirk_inloop_shift=True)) claims a closed form of that
    ordering; this test double-enters it by SEQUENCING the actual ordering
    on the env API — step, then per species: obs from the current
    (post-shift) state, update, shift, write — and pins state + params."""
    import jax.numpy as jnp
    from madrona_bots_tpu.env import env as env_mod
    from madrona_bots_tpu.env.state import init_state
    from madrona_bots_tpu.learn.a2c import (SpeciesTrainState,
                                            _species_update,
                                            init_train_states,
                                            make_optimizer, make_train_tick)
    from madrona_bots_tpu.learn.obs import construct_obs
    from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator
    from madrona_bots_tpu.config import NUM_ACTIONS

    cfg = EnvConfig(num_worlds=4, init_agents=8, max_agents=16)
    NS = cfg.num_species
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 32, cfg.hidden_state_dim,
                              seed=3)
    models = [ActorCritic.from_generator(gen) for _ in range(NS)]
    optimizer = make_optimizer(1e-3)

    def ref_ordered_tick(state, tstates, key):
        """The reference's literal sequencing (training_loop.py:52-137)."""
        state = env_mod.sensor_pass(
            env_mod.step_systems(state, cfg, False), cfg, False)
        W, A = state.alive.shape
        Asub = A // NS
        Nc = W * Asub
        H = state.hidden.shape[-1]
        rewards0 = state.reward          # cloned before the loop (ref :49)
        action0 = state.action           # rows read before their write
        new_ts = list(tstates)
        for s in range(NS):
            obs_cur = construct_obs(state, cfg, prev=False)
            obs_prev = construct_obs(state, cfg, prev=True)
            sl = lambda x: x.reshape((W, Asub, NS) + x.shape[2:])[:, :, s]
            mask = (sl(state.alive)
                    & (sl(state.species) == s + 1)).astype(jnp.float32)
            mask = mask.reshape(Nc)
            ts, actions, mem, _ = _species_update(
                models[s], optimizer, new_ts[s],
                sl(obs_cur).reshape(Nc, -1), sl(obs_prev).reshape(Nc, -1),
                sl(state.hidden.reshape(W, A, H)).reshape(Nc, H),
                sl(state.prev_hidden).reshape(Nc, H),
                jnp.argmax(sl(action0), axis=-1).reshape(Nc),
                sl(rewards0).reshape(Nc), mask,
                jax.random.fold_in(key, s), 1.0, False, None,
                loss_mask=mask)
            new_ts[s] = ts
            # shift FIRST, then write this species' rows (ref :135-137)
            state = env_mod.shift_observations_impl(state, cfg)
            onehot = (jax.nn.one_hot(actions, NUM_ACTIONS, dtype=jnp.int32)
                      * mask[:, None].astype(jnp.int32))
            a4 = state.action.reshape(W, Asub, NS, NUM_ACTIONS)
            h4 = state.hidden.reshape(W, Asub, NS, H)
            state = state.replace(
                action=a4.at[:, :, s].set(
                    onehot.reshape(W, Asub, NUM_ACTIONS)).reshape(
                        W, A, NUM_ACTIONS),
                hidden=h4.at[:, :, s].set(
                    (mem * mask[:, None]).reshape(W, Asub, H)).reshape(
                        state.hidden.shape))
        return state, tuple(new_ts)

    tick, _ = make_train_tick(models, cfg, lr=1e-3, use_pallas=False,
                              quirk_inloop_shift=True)
    ts_q = init_train_states(models, jax.random.key(1), optimizer)
    ts_r = init_train_states(models, jax.random.key(1), optimizer)
    st_q = init_state(jax.random.key(0), cfg)
    st_r = init_state(jax.random.key(0), cfg)
    ref_jit = jax.jit(ref_ordered_tick)
    key = jax.random.key(11)
    for t in range(3):
        k = jax.random.fold_in(key, t)
        st_q, ts_q, _ = tick(st_q, ts_q, k)
        st_r, ts_r = ref_jit(st_r, ts_r, k)
        for f in ("alive", "species", "health", "action", "prev_action",
                  "stats", "finder"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st_q, f)), np.asarray(getattr(st_r, f)),
                err_msg=f"tick {t} field {f}")
        for f in ("hidden", "prev_hidden", "pos", "reward"):
            np.testing.assert_allclose(
                np.asarray(getattr(st_q, f)), np.asarray(getattr(st_r, f)),
                rtol=0, atol=1e-5, err_msg=f"tick {t} field {f}")
    for a, b in zip(jax.tree.leaves(tuple(ts_q)), jax.tree.leaves(tuple(ts_r))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)
