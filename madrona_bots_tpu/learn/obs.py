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
from madrona_bots_tpu.learn.pack import Packer, gather_rows

f32 = jnp.float32


def obs_field_cols(state: WorldState, cfg: EnvConfig, prev: bool = False,
                   quirk_compat: bool = False, dtype=f32):
    """The obs as a COLUMN LIST (util.py:23-28 order: depth 32, health 1,
    pos 2, semantic 32, surrounding 2) so callers can splice the fields
    into a larger payload with ONE concatenate instead of building the
    [W, A, obs_dim] tensor first (a2c.py's compaction payload)."""
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
    return [depth.astype(dtype), health_col.astype(dtype),
            pos.astype(dtype), semantic.astype(dtype),
            surrounding.astype(dtype)]


def construct_obs(state: WorldState, cfg: EnvConfig, prev: bool = False,
                  quirk_compat: bool = False, dtype=f32) -> jnp.ndarray:
    """[W, A, obs_dim] in `dtype`. With quirk_compat=True the depth block
    carries the semantic bytes (Q1, sim.cpp:98-104) and the health column is
    the int32 storage bit-reinterpreted as float32 (Q2, mgr.cpp:329-346) —
    the exact values the reference trains on. Building directly in bf16
    halves the HBM traffic of the learner's obs reads (the dominant cost of
    the train tick)."""
    return jnp.concatenate(
        obs_field_cols(state, cfg, prev, quirk_compat, dtype), axis=-1)


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

    Transport is ONE exact bf16 einsum (learn/pack.py): integer payloads
    (depth u8 <= 255, semantic i8, health <= 100) ride single bf16
    columns; floats cast to bf16 FIRST when dtype is bf16 (matching
    construct_obs's cast point) or ride the exact 3-way bf16 split when
    dtype is f32.
    """
    G, rows, Asub = oh.shape
    pk = Packer()
    fin = pack_obs_fields(pk, depth, health, pos, semantic, surrounding,
                          quirk_compat=quirk_compat, dtype=dtype)
    out = fin(*pk.unpack(gather_rows(oh, pk.payload())))
    return out.reshape(G * rows, out.shape[-1])


def pack_obs_fields(pk: Packer, depth, health, pos, semantic, surrounding,
                    quirk_compat: bool = False, dtype=f32):
    """Add the 69-dim obs payload fields to `pk` (for fusing the obs build
    into a larger one-hot contraction); returns finalize(d, h, p, sm, su)
    -> [..., 69] in `dtype`, to call on the matching `unpack` slice.

    Quirk handling: Q1 substitutes the semantic bytes for the depth block
    BEFORE packing (sim.cpp:98-104); Q2's health column rides as its exact
    INTEGER value (<= 100) and is bit-reinterpreted to f32 AFTER transport
    (mgr.cpp:329-346 — the bit patterns are f32 denormals that any matmul
    transport would flush to zero)."""
    if quirk_compat:
        depth = semantic.astype(jnp.uint8)
    add_float = pk.add_bf16 if dtype == jnp.bfloat16 else pk.add_f32
    pk.add_int(depth)
    pk.add_int(health)
    add_float(pos)
    pk.add_int(semantic)
    add_float(surrounding)

    def finalize(d, h, p, sm, su):
        if h.ndim < d.ndim:
            h = h[..., None]
        if quirk_compat:
            h = jax.lax.bitcast_convert_type(
                jnp.round(h).astype(jnp.int32), f32)
        return jnp.concatenate([
            d.astype(dtype), h.astype(dtype), p.astype(dtype),
            sm.astype(dtype), su.astype(dtype)], axis=-1)

    return finalize
