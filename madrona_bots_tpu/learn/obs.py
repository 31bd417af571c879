"""Observation construction on padded [W, A] layout.

The reference flattens to a species-major [total_agents, 69] table via a
global sort + cumsum slicing (util.py:14-29, training_loop.py:43-45). The
TPU-native path skips the sort entirely: all four species train on the same
padded [W*A, 69] batch with per-species masks — shapes stay static under jit
and shard cleanly over the worlds axis.

69-dim layout (util.py:23-28): [depth(32), health(1), pos(2), semantic(32),
surrounding(2)].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from madrona_bots_tpu.config import EnvConfig
from madrona_bots_tpu.env.state import WorldState

f32 = jnp.float32


def construct_obs(state: WorldState, cfg: EnvConfig, prev: bool = False,
                  quirk_compat: bool = False, dtype=f32) -> jnp.ndarray:
    """[W, A, obs_dim] in `dtype`. With quirk_compat=True the depth block
    carries the semantic bytes (Q1, sim.cpp:98-104) and the health column is
    the int32 storage bit-reinterpreted as float32 (Q2, mgr.cpp:329-346) —
    the exact values the reference trains on. Building directly in bf16
    halves the HBM traffic of the learner's obs reads (the dominant cost of
    the train tick)."""
    if prev:
        depth = state.prev_sensor_depth
        semantic = state.prev_sensor_semantic
        health = state.prev_health
        pos = state.prev_pos
        surrounding = state.prev_surrounding
    else:
        depth = state.sensor_depth
        semantic = state.sensor_semantic
        health = state.health
        pos = state.pos
        surrounding = state.surrounding
    health_col = health[..., None]
    if quirk_compat:
        depth = semantic.astype(jnp.uint8)
        health_col = jax.lax.bitcast_convert_type(
            health_col.astype(jnp.int32), f32)
    return jnp.concatenate([
        depth.astype(dtype),
        health_col.astype(dtype),
        pos.astype(dtype),
        semantic.astype(dtype),
        surrounding.astype(dtype),
    ], axis=-1)


def species_mask(state: WorldState, species_id: int) -> jnp.ndarray:
    """[W, A] f32 mask: alive and of the given 1-based species."""
    return (state.alive & (state.species == species_id)).astype(f32)
