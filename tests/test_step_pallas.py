"""Fused systems megakernel (ops/step_pallas.py) vs the jnp spec path.

The kernel's bit-parity contract (see step_pallas.py docstring): exact
equality on every field except `surrounding`/`prev_surrounding`, which use
the oracle's 4-corner FMA form instead of the jnp fused-weight einsum
(observation-only; tolerance).

Runs the kernel in interpret mode so the parity suite works on CPU; the
TPU-compiled kernel is covered by artifacts/hw_kernel_parity.py and bench.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_bots_tpu import EnvConfig, init_state
from madrona_bots_tpu.env.env import set_actions, step_systems
from madrona_bots_tpu.ops.step_pallas import fused_step_systems

EXACT_FIELDS = [
    "pos", "heading", "health", "alive", "species", "stats", "hidden",
    "action", "reward", "finder", "sensor_depth", "sensor_semantic",
    "prev_sensor_depth", "prev_sensor_semantic", "prev_species", "prev_pos",
    "prev_health", "prev_reward", "prev_action", "prev_stats", "prev_hidden",
    "food_count", "food_cell", "num_food", "species_counts",
    "species_rewards", "step_count",
]
TOL_FIELDS = ["surrounding", "prev_surrounding"]


def random_actions(rng, W, A, heavy=False):
    acts = np.zeros((W, A, 6), np.int32)
    a = rng.integers(0, 6, (W, A))
    acts[np.arange(W)[:, None], np.arange(A)[None, :], a] = 1
    if heavy:  # force allocator/damage churn
        acts[:, :, 4] |= rng.integers(0, 2, (W, A)).astype(np.int32)
        acts[:, :, 5] |= rng.integers(0, 2, (W, A)).astype(np.int32)
    return acts


def assert_state_match(s_ref, s_k, ctx):
    for f in EXACT_FIELDS:
        a = np.asarray(getattr(s_ref, f))
        b = np.asarray(getattr(s_k, f))
        mism = np.argwhere(a != b)
        assert mism.size == 0, (
            f"{ctx} field {f}: {mism.shape[0]} mismatches, first at "
            f"{mism[0]}: jnp={a[tuple(mism[0])]} kernel={b[tuple(mism[0])]}")
    for f in TOL_FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(s_k, f)), np.asarray(getattr(s_ref, f)),
            rtol=1e-5, atol=1e-4, err_msg=f"{ctx} field {f}")


@pytest.mark.parametrize("seed,heavy", [(0, False), (3, True)])
def test_fused_matches_spec(seed, heavy):
    cfg = EnvConfig(num_worlds=4, init_agents=32, max_agents=64)
    key = jax.random.key(seed)
    s_ref = init_state(key, cfg)
    s_k = jax.tree.map(jnp.copy, s_ref)
    rng = np.random.default_rng(seed)
    from madrona_bots_tpu.env.env import sensor_pass
    for t in range(20):
        acts = jnp.array(random_actions(rng, cfg.num_worlds, cfg.max_agents,
                                        heavy))
        # Sensor between steps so finder/shoot/breed paths are exercised.
        s_ref = sensor_pass(step_systems(set_actions(s_ref, acts), cfg), cfg)
        s_k = sensor_pass(
            fused_step_systems(set_actions(s_k, acts), cfg, interpret=True),
            cfg)
        assert_state_match(s_ref, s_k, f"step {t}")


def test_fused_odd_shapes():
    """Non-default geometry: 5x3 chunks, 16 slots, small food cap."""
    cfg = EnvConfig(num_worlds=3, init_agents=8, max_agents=16,
                    num_chunks_x=5, num_chunks_y=3, total_allowed_food=11)
    key = jax.random.key(13)
    s_ref = init_state(key, cfg)
    s_k = jax.tree.map(jnp.copy, s_ref)
    rng = np.random.default_rng(13)
    from madrona_bots_tpu.env.env import sensor_pass
    for t in range(12):
        acts = jnp.array(random_actions(rng, 3, 16, heavy=(t % 2 == 0)))
        s_ref = sensor_pass(step_systems(set_actions(s_ref, acts), cfg), cfg)
        s_k = sensor_pass(
            fused_step_systems(set_actions(s_k, acts), cfg, interpret=True),
            cfg)
        assert_state_match(s_ref, s_k, f"odd step {t}")


def test_fused_stacked_packages():
    """3+ present packages on ONE cell force the kernel's rank>=2 eat tail.

    The fused eat resolves rank-0/1 packages in two batched prefix passes;
    packages stacked deeper on a single (chunk, cell) take the sequential
    pl.when fallback. Park every agent on the stacked cell so each package
    has contenders and the tail must produce real winners.
    """
    cfg = EnvConfig(num_worlds=2, init_agents=16, max_agents=32)
    s = init_state(jax.random.key(5), cfg)
    fc = np.asarray(s.food_count).copy()
    fcell = np.asarray(s.food_cell).copy()
    fc[:] = 0
    fcell[:] = 0
    fc[0, 0, :4] = 1            # world 0: 4 packages on chunk 0 cell (0, 0)
    fcell[0, 0, :4] = (0, 0)
    fc[1, 1, :5] = 1            # world 1: all 5 on chunk 1 cell (3, 2)
    fcell[1, 1, :5] = (3, 2)
    pos = np.zeros_like(np.asarray(s.pos))
    pos[0, :, :] = (0.5, 0.5)           # chunk 0, cell (0, 0)
    pos[1, :, :] = (19.5, 2.5)          # chunk 1 (x=1), cell (3, 2)
    s = s.replace(food_count=jnp.array(fc), food_cell=jnp.array(fcell),
                  num_food=jnp.array(fc.sum(axis=(1, 2)), dtype=jnp.int32),
                  pos=jnp.array(pos),
                  action=jnp.zeros_like(s.action))
    s_ref = step_systems(s, cfg)
    s_k = fused_step_systems(jax.tree.map(jnp.copy, s), cfg, interpret=True)
    assert_state_match(s_ref, s_k, "stacked packages")
    # The stacked packages must actually be eaten (winners from the tail).
    eaten = np.asarray(s_k.stats)[..., 2].sum(axis=1)
    assert eaten[0] >= 4 and eaten[1] >= 5, eaten


def test_fused_two_species():
    cfg = EnvConfig(num_worlds=2, init_agents=12, max_agents=24, num_species=2)
    key = jax.random.key(21)
    s_ref = init_state(key, cfg)
    s_k = jax.tree.map(jnp.copy, s_ref)
    rng = np.random.default_rng(21)
    from madrona_bots_tpu.env.env import sensor_pass
    for t in range(10):
        acts = jnp.array(random_actions(rng, 2, 24, heavy=True))
        s_ref = sensor_pass(step_systems(set_actions(s_ref, acts), cfg), cfg)
        s_k = sensor_pass(
            fused_step_systems(set_actions(s_k, acts), cfg, interpret=True),
            cfg)
        assert_state_match(s_ref, s_k, f"2sp step {t}")
