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


def compact_obs_rows(depth, health, pos, semantic, surrounding, oh,
                     quirk_compat: bool = False, dtype=f32) -> jnp.ndarray:
    """Build learner-row-compacted observations WITHOUT materializing the
    full-capacity obs tensor.

    Equivalent to `construct_obs(...)` on a class view followed by the
    one-hot row gather (each field cast to the transport dtype at the same
    point the full path casts it), except the quirk Q2 health column,
    which the old composition silently zeroed: its int-bits-as-f32 values
    are denormals that any matmul transport flushes, so here the INT rides
    the einsum (exact, <= 100) and the bitcast happens post-compaction.
    The full-capacity [W, A, 69] obs tensor is never materialized
    (class-width payload only), and the whole build is ONE einsum.

    Args: per-class fields [G, Asub(, k)]; oh [G, rows, Asub] bool one-hot
    (ascending rank compaction). Returns [G*rows, 69] in `dtype`.

    Transport exactness: integer payloads (depth u8 <= 255, semantic i8,
    health <= 100) are exact in either operand dtype (<= 1 nonzero per
    sum, f32 accumulation); float payloads either cast to bf16 FIRST when
    dtype is bf16 (matching construct_obs's cast point) or ride f32
    operands at HIGHEST precision (TPU default would truncate them to
    bf16 — CLAUDE.md).
    """
    G, rows, Asub = oh.shape
    S = depth.shape[-1]
    if quirk_compat:
        # Q1: the depth block carries the semantic bytes (uint8 view of
        # the int8 storage, sim.cpp:98-104). Q2 (health bitcast) is applied
        # AFTER transport — see below.
        depth = semantic.astype(jnp.uint8)
    # ONE einsum per call (many small per-field einsums cost ~0.2 ms of
    # dispatch each on v5e — measured 9 ms/tick of pure overhead): all
    # fields concat into a single payload at CLASS width. In the quirk
    # case the health column rides as its INTEGER value (exact: <= 100,
    # bf16-representable) and is bit-reinterpreted post-compaction — a
    # matmul would flush the int-bits-as-f32 denormals to zero.
    payload = jnp.concatenate([
        depth.astype(dtype), health[..., None].astype(dtype)
        if not quirk_compat else health[..., None].astype(jnp.int32).astype(dtype),
        pos.astype(dtype), semantic.astype(dtype),
        surrounding.astype(dtype)], axis=-1)               # [G, Asub, D]
    if dtype == jnp.bfloat16:
        out = jnp.einsum("gka,gad->gkd", oh.astype(jnp.bfloat16), payload,
                         preferred_element_type=f32).astype(dtype)
    else:
        out = jnp.einsum("gka,gad->gkd", oh.astype(f32), payload,
                         preferred_element_type=f32,
                         precision=jax.lax.Precision.HIGHEST)
    if quirk_compat:
        h_int = jnp.round(out[..., S:S + 1].astype(f32)).astype(jnp.int32)
        h_col = jax.lax.bitcast_convert_type(h_int, f32).astype(dtype)
        out = jnp.concatenate([out[..., :S], h_col, out[..., S + 1:]],
                              axis=-1)
    return out.reshape(G * rows, out.shape[-1])
