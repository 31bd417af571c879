"""Structural invariants of the environment over long random rollouts."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_bots_tpu import EnvConfig, init_state, step
from madrona_bots_tpu.env.env import set_actions, shift_observations
from madrona_bots_tpu.env.systems import claim_slots


def random_actions(rng, W, A):
    acts = np.zeros((W, A, 6), np.int32)
    a = rng.integers(0, 6, (W, A))
    acts[np.arange(W)[:, None], np.arange(A)[None, :], a] = 1
    return acts


def test_invariants_over_rollout():
    cfg = EnvConfig(num_worlds=4, init_agents=32, max_agents=64)
    s = init_state(jax.random.key(2), cfg)
    rng = np.random.default_rng(2)
    for t in range(50):
        s = step(set_actions(s, jnp.array(random_actions(rng, 4, 64))), cfg)
        alive = np.asarray(s.alive)
        health = np.asarray(s.health)
        species = np.asarray(s.species)
        pos = np.asarray(s.pos)
        food = np.asarray(s.food_count)
        nf = np.asarray(s.num_food)

        # Alive agents have positive health and valid species; dead are zeroed.
        assert (health[alive] > 0).all()
        assert np.isin(species[alive], np.arange(1, 5)).all()
        assert (health[~alive] == 0).all()
        assert (species[~alive] == 0).all()
        # Positions inside the arena. Movement clamps to lim-1, but fresh
        # init/respawn positions are uniform in [0, lim) until the agent
        # moves (sim.cpp:250-251, 827-828) — so the bound is lim, not lim-1.
        assert (pos[alive][:, 0] >= 0).all() and (pos[alive][:, 0] < cfg.world_lim_x).all()
        assert (pos[alive][:, 1] >= 0).all() and (pos[alive][:, 1] < cfg.world_lim_y).all()
        # Food bookkeeping: package counts in {0,1}; num_food == sum; cap respected.
        assert np.isin(food, [0, 1]).all()
        np.testing.assert_array_equal(nf, food.sum(axis=(1, 2)))
        assert (nf <= cfg.total_allowed_food).all()
        # Respawn floor: post-respawn population per species >= min(floor, ...)
        counts_now = np.stack([(species == k + 1)[..., :].sum(-1) for k in range(4)], -1)
        assert (counts_now >= cfg.respawn_floor).all() or t == 0


def test_respawn_floor_after_extinction():
    """Kill everything via massive friendly fire and check species recover."""
    cfg = EnvConfig(num_worlds=1, init_agents=32, max_agents=64)
    s = init_state(jax.random.key(0), cfg)
    # Force everyone to shoot whoever is in the crosshair for many steps.
    acts = np.zeros((1, 64, 6), np.int32)
    acts[:, :, 4] = 1  # shoot
    for _ in range(30):
        s = step(set_actions(s, jnp.array(acts)), cfg)
    counts = np.asarray(s.species_counts)[0]
    alive_per_species = np.array([
        int((np.asarray(s.species)[0][np.asarray(s.alive)[0]] == k + 1).sum())
        for k in range(4)])
    assert (alive_per_species >= cfg.respawn_floor).all()
    assert counts.sum() > 0


def test_claim_slots_basic():
    free = jnp.array([[True, False, True, True], [False, False, False, True]])
    active = jnp.array([[True, True, True, False], [True, True, False, False]])
    slots, new_free = claim_slots(free, active)
    np.testing.assert_array_equal(np.asarray(slots), [[0, 2, 3, -1], [3, -1, -1, -1]])
    np.testing.assert_array_equal(np.asarray(new_free),
                                  [[False] * 4, [False] * 4])


def test_shift_observations():
    cfg = EnvConfig(num_worlds=2, init_agents=16, max_agents=32)
    s = init_state(jax.random.key(4), cfg)
    rng = np.random.default_rng(4)
    s = step(set_actions(s, jnp.array(random_actions(rng, 2, 32))), cfg)
    s2 = shift_observations(s, cfg)
    np.testing.assert_array_equal(np.asarray(s2.prev_health), np.asarray(s2.health))
    np.testing.assert_array_equal(np.asarray(s2.prev_species), np.asarray(s2.species))
    np.testing.assert_allclose(np.asarray(s2.prev_pos), np.asarray(s2.pos))
    np.testing.assert_array_equal(np.asarray(s2.prev_stats), np.asarray(s2.stats))


def test_breeding_creates_children():
    """Two same-species agents facing each other with breed flag reproduce."""
    cfg = EnvConfig(num_worlds=1, init_agents=32, max_agents=64)
    s = init_state(jax.random.key(0), cfg)
    acts = np.zeros((1, 64, 6), np.int32)
    acts[:, :, 5] = 1  # breed
    pop0 = int(np.asarray(s.alive).sum())
    for _ in range(20):
        s = step(set_actions(s, jnp.array(acts)), cfg)
    # With everyone trying to breed, population should not shrink and usually grows.
    assert int(np.asarray(s.alive).sum()) >= pop0


def test_rollout_matches_stepwise():
    """env.rollout (scanned block) == the same ticks dispatched one by one."""
    from madrona_bots_tpu.config import NUM_ACTIONS
    from madrona_bots_tpu.env.env import rollout

    cfg = EnvConfig(num_worlds=2, init_agents=16, max_agents=32)

    def pi(s, k):
        W, A = s.alive.shape
        a = jax.random.randint(k, (W, A), 0, NUM_ACTIONS)
        return jax.nn.one_hot(a, NUM_ACTIONS, dtype=jnp.int32)

    key = jax.random.key(3)
    s_block = jax.jit(lambda s, k: rollout(s, k, 5, pi, cfg))(
        init_state(jax.random.key(4), cfg), key)

    s_loop = init_state(jax.random.key(4), cfg)
    for k in jax.random.split(key, 5):
        s_loop = step(set_actions(s_loop, pi(s_loop, k)), cfg)

    for f in ["alive", "species", "health", "sensor_depth", "finder"]:
        np.testing.assert_array_equal(np.asarray(getattr(s_block, f)),
                                      np.asarray(getattr(s_loop, f)), err_msg=f)
    np.testing.assert_allclose(np.asarray(s_block.pos),
                               np.asarray(s_loop.pos), rtol=1e-6, atol=1e-5)


def test_species_class_slot_invariant():
    """SPEC D2b: slot i only ever holds species (i % NS) + 1 (or 0/dead)."""
    cfg = EnvConfig(num_worlds=4, init_agents=16, max_agents=32)
    s = init_state(jax.random.key(5), cfg)
    cls = (np.arange(cfg.max_agents) % cfg.num_species) + 1
    rng = np.random.default_rng(5)
    for _ in range(40):
        s = step(set_actions(s, jnp.array(random_actions(rng, 4, 32))), cfg)
        species = np.asarray(s.species)
        alive = np.asarray(s.alive)
        assert (species[alive] == np.broadcast_to(cls, species.shape)[alive]).all()
