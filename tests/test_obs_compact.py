"""compact_obs_rows == construct_obs + one-hot row gather, bit-exact.

The per-field compaction (learn/obs.py:compact_obs_rows) replaces the
full-capacity obs build in the compacted A2C/PPO paths; these tests pin its
transport to the reference composition for every dtype/quirk combination.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
from madrona_bots_tpu.env.env import set_actions, step
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.learn.obs import compact_obs_rows, construct_obs

f32 = jnp.float32


def _stepped_state(cfg, steps=3):
    state = init_state(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    for _ in range(steps):
        acts = np.zeros((cfg.num_worlds, cfg.max_agents, NUM_ACTIONS),
                        np.int32)
        a = rng.integers(0, NUM_ACTIONS, (cfg.num_worlds, cfg.max_agents))
        acts[np.arange(cfg.num_worlds)[:, None],
             np.arange(cfg.max_agents)[None, :], a] = 1
        state = step(set_actions(state, jnp.array(acts)), cfg)
    return state


@pytest.mark.parametrize("dtype", [f32, jnp.bfloat16])
@pytest.mark.parametrize("quirk", [False, True])
def test_compact_obs_rows_matches_reference(dtype, quirk):
    cfg = EnvConfig(num_worlds=4, init_agents=16, max_agents=32)
    state = _stepped_state(cfg)
    W, A = state.alive.shape
    NS = cfg.num_species
    Asub = A // NS
    rows = 6
    _HI = jax.lax.Precision.HIGHEST

    obs_full = construct_obs(state, cfg, quirk_compat=quirk, dtype=dtype)
    obs4 = obs_full.reshape(W, Asub, NS, cfg.obs_dim)

    def cls(x, s):
        return x.reshape((W, Asub, NS) + x.shape[2:])[:, :, s]

    for s in range(NS):
        m3 = cls(state.alive, s) & (cls(state.species, s) == s + 1)
        rank = jnp.cumsum(m3.astype(jnp.int32), axis=1) - 1
        keep = m3 & (rank < rows)
        oh = ((rank[:, None, :] == jnp.arange(rows)[None, :, None])
              & keep[:, None, :])                           # [W, rows, Asub]

        # Ground truth: full obs build + PHYSICAL numpy row gather (no
        # arithmetic on payloads). The old einsum composition is NOT used
        # as the reference because it flushed the quirk health denormals
        # (int-bits-as-f32, e.g. health=100 -> 1.4e-43) to zero inside the
        # dot — a bug compact_obs_rows fixes by transporting the int and
        # bitcasting after.
        obs_np = np.asarray(obs4[:, :, s], np.float32)   # [W, Asub, D]
        keep_np = np.asarray(keep)
        rank_np = np.asarray(rank)
        ref = np.zeros((W, rows, cfg.obs_dim), np.float32)
        for w in range(W):
            for a in range(Asub):
                if keep_np[w, a]:
                    ref[w, rank_np[w, a]] = obs_np[w, a]
        ref = jnp.asarray(ref).astype(dtype).astype(np.float32)
        ref = np.asarray(ref).reshape(W * rows, cfg.obs_dim)

        got = compact_obs_rows(
            cls(state.sensor_depth, s), cls(state.health, s),
            cls(state.pos, s), cls(state.sensor_semantic, s),
            cls(state.surrounding, s), oh, quirk_compat=quirk, dtype=dtype)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            err_msg=f"species {s} dtype {dtype} quirk {quirk}")
