"""Config-fuzz parity: the fused systems kernel vs the jnp spec path across
randomized world geometries, capacities and species counts.

The targeted tests (test_step_pallas.py) pin a few shapes; this sweep
randomizes the config axes the kernel's packing tricks depend on —
chunk-grid size (6-bit corner ids, 2x32 chunk-bit prefix-OR), capacity
(byte-packed class ranks), species count, food caps — and asserts the same
exact-equality contract on each. Seeded, so failures reproduce.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_bots_tpu import EnvConfig, init_state
from madrona_bots_tpu.env.env import sensor_pass, step_systems
from madrona_bots_tpu.ops.step_pallas import fused_step_systems

EXACT_FIELDS = [
    "pos", "heading", "health", "alive", "species", "stats", "reward",
    "finder", "prev_sensor_depth", "prev_sensor_semantic", "food_count",
    "num_food", "species_counts", "species_rewards",
]


def random_cfg(rng):
    num_species = int(rng.choice([2, 4]))
    asub = int(rng.integers(3, 12))
    max_agents = asub * num_species
    init = num_species * int(rng.integers(1, asub))
    return EnvConfig(
        num_worlds=int(rng.integers(1, 4)),
        init_agents=init,
        max_agents=max_agents,
        num_species=num_species,
        num_chunks_x=int(rng.integers(2, 9)),
        num_chunks_y=int(rng.integers(2, 8)),
        total_allowed_food=int(rng.integers(3, 31)),
        shoot_damage=int(rng.choice([30, 50, 90])),
        breed_cost=int(rng.choice([20, 40])),
    )


@pytest.mark.parametrize("seed", range(6))
def test_fused_kernel_config_fuzz(seed):
    rng = np.random.default_rng(100 + seed)
    cfg = random_cfg(rng)
    assert cfg.num_chunks <= 64

    key = jax.random.key(seed)
    s_ref = init_state(key, cfg)
    s_k = jax.tree.map(jnp.copy, s_ref)
    W, A = cfg.num_worlds, cfg.max_agents

    for t in range(10):
        acts = np.zeros((W, A, 6), np.int32)
        a = rng.integers(0, 6, (W, A))
        acts[np.arange(W)[:, None], np.arange(A)[None, :], a] = 1
        acts[:, :, 4] |= rng.integers(0, 2, (W, A)).astype(np.int32)
        acts[:, :, 5] |= rng.integers(0, 2, (W, A)).astype(np.int32)
        acts_j = jnp.array(acts)
        s_ref = sensor_pass(
            step_systems(s_ref.replace(action=acts_j), cfg), cfg)
        s_k = sensor_pass(
            fused_step_systems(s_k.replace(action=acts_j), cfg,
                               interpret=True), cfg)
        for f in EXACT_FIELDS:
            av = np.asarray(getattr(s_ref, f))
            bv = np.asarray(getattr(s_k, f))
            mism = np.argwhere(av != bv)
            assert mism.size == 0, (
                f"cfg={cfg} seed={seed} step {t} field {f}: first mismatch "
                f"{mism[0]}: spec={av[tuple(mism[0])]} kernel={bv[tuple(mism[0])]}")
        np.testing.assert_allclose(
            np.asarray(s_k.surrounding), np.asarray(s_ref.surrounding),
            rtol=1e-5, atol=1e-4, err_msg=f"seed {seed} step {t} surrounding")
