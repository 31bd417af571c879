"""World state: a struct-of-arrays pytree with fixed-capacity agent slots.

Replaces the Madrona ECS archetypes (reference: src/sim/types.hpp:187-252) —
dynamic entity rows, per-tick radix sorts and entity recycling
(sim.cpp:1129-1132) — with static `[num_worlds, max_agents]` arrays plus an
`alive` mask. Everything is shape-static so one jitted step compiles once and
shards over a device mesh along the worlds axis with no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS, SALT_WORLD, SALT_INIT


@struct.dataclass
class WorldState:
    """All per-world simulation state. Leading axis: worlds (W). A = max_agents.

    Component mapping to the reference Agent archetype (types.hpp:187-223) and
    AgentObservationArchetype (types.hpp:228-252): one array per component, the
    obs-entity indirection (AgentObservationBridge) disappears because slots
    never move (no sorts).
    """

    # --- agent core state ---
    pos: jax.Array            # [W, A, 2] f32 — base::Position (z is constant 1)
    heading: jax.Array        # [W, A]   f32 — base::Rotation as a z-axis angle
    health: jax.Array         # [W, A]   i32 — Health (types.hpp:119-121)
    alive: jax.Array          # [W, A]   bool — replaces entity existence
    species: jax.Array        # [W, A]   i32 — Species.speciesID, 1..num_species (0 = never used)
    stats: jax.Array          # [W, A, 4] i32 — AgentStats: hit_friendly, hit_enemy, ate_food, reproduced
    hidden: jax.Array         # [W, A, H] f32 — HiddenState (types.hpp:37-41), learner memory
    action: jax.Array         # [W, A, 6] i32 — Action buffer (written by the learner)
    surrounding: jax.Array    # [W, A, 2] f32 — SurroundingObservation
    reward: jax.Array         # [W, A]   f32 — Reward

    # --- sensor state (filled by sensor_pass; previous frame drives shoot/breed) ---
    sensor_depth: jax.Array     # [W, A, S] u8
    sensor_semantic: jax.Array  # [W, A, S] i8
    prev_sensor_depth: jax.Array     # [W, A, S] u8 — shifted inside step (SPEC §8)
    prev_sensor_semantic: jax.Array  # [W, A, S] i8
    finder: jax.Array           # [W, A] i32 — crosshair target slot, -1 = none (FinderOutput)

    # --- "Prev*" observation twins, moved only by shift_observations (SPEC) ---
    prev_species: jax.Array      # [W, A]    i32
    prev_pos: jax.Array          # [W, A, 2] f32
    prev_health: jax.Array       # [W, A]    i32
    prev_surrounding: jax.Array  # [W, A, 2] f32
    prev_reward: jax.Array       # [W, A]    f32
    prev_action: jax.Array       # [W, A, 6] i32
    prev_stats: jax.Array        # [W, A, 4] i32
    prev_hidden: jax.Array       # [W, A, H] f32

    # --- food (ChunkInfo.foodPackages, types.hpp:76-103); C = chunks, P = packages ---
    food_count: jax.Array     # [W, C, P] i32 — FoodPackage.numFood (0 or 1)
    food_cell: jax.Array      # [W, C, P, 2] i32 — FoodPackage.x, y (cell within chunk)
    num_food: jax.Array       # [W] i32 — Sim::currentNumFood

    # --- per-species info (SpeciesInfoArchetype, types.hpp:170-174) ---
    species_counts: jax.Array   # [W, NS] i32 — SpeciesCount (pre-respawn, SPEC §6)
    species_rewards: jax.Array  # [W, NS] f32 — SpeciesReward

    # --- bookkeeping ---
    step_count: jax.Array     # [] i32
    world_keys: jax.Array     # [W, 2] u32 — fold_in(fold_in(seed, SALT_WORLD), w)


def init_state(key: jax.Array, cfg: EnvConfig) -> WorldState:
    """Create the initial state: initWorld semantics (sim.cpp:233-275).

    init_agents agents per world in slots [0, init_agents): species
    (i % num_species) + 1 (sim.cpp:248), uniform positions (sim.cpp:250-251),
    heading 0, health 100. Food grid empty (initializeChunks, sim.cpp:277-300).
    """
    W, A, S, H = cfg.num_worlds, cfg.max_agents, cfg.sensor_size, cfg.hidden_state_dim
    C, P, NS = cfg.num_chunks, cfg.max_food_packages, cfg.num_species

    world_salted = jax.random.fold_in(key, SALT_WORLD)
    world_keys = jax.vmap(lambda w: jax.random.fold_in(world_salted, w))(jnp.arange(W))

    def init_positions(wkey):
        k = jax.random.fold_in(wkey, SALT_INIT)
        u = jax.random.uniform(k, (A, 2), dtype=jnp.float32)
        lims = jnp.array([cfg.world_lim_x, cfg.world_lim_y], dtype=jnp.float32)
        return u * lims

    pos = jax.vmap(init_positions)(world_keys)

    slot = jnp.arange(A, dtype=jnp.int32)
    alive0 = slot < cfg.init_agents
    species0 = jnp.where(alive0, (slot % cfg.num_species) + 1, 0)
    alive = jnp.broadcast_to(alive0, (W, A))
    species = jnp.broadcast_to(species0, (W, A)).astype(jnp.int32)
    pos = jnp.where(alive[..., None], pos, 0.0)

    f32 = jnp.float32
    i32 = jnp.int32
    return WorldState(
        pos=pos,
        heading=jnp.zeros((W, A), f32),
        health=jnp.where(alive, cfg.init_health, 0).astype(i32),
        alive=alive,
        species=species,
        stats=jnp.zeros((W, A, 4), i32),
        hidden=jnp.zeros((W, A, H), f32),
        action=jnp.zeros((W, A, NUM_ACTIONS), i32),
        surrounding=jnp.zeros((W, A, 2), f32),
        reward=jnp.zeros((W, A), f32),
        sensor_depth=jnp.zeros((W, A, S), jnp.uint8),
        sensor_semantic=jnp.full((W, A, S), -1, jnp.int8),
        prev_sensor_depth=jnp.zeros((W, A, S), jnp.uint8),
        prev_sensor_semantic=jnp.full((W, A, S), -1, jnp.int8),
        finder=jnp.full((W, A), -1, i32),
        # NB: distinct buffers (not aliases of species/pos) so step() can
        # donate the whole state without double-donation errors.
        prev_species=jnp.copy(species),
        prev_pos=jnp.copy(pos),
        prev_health=jnp.where(alive, cfg.init_health, 0).astype(i32),
        prev_surrounding=jnp.zeros((W, A, 2), f32),
        prev_reward=jnp.zeros((W, A), f32),
        prev_action=jnp.zeros((W, A, NUM_ACTIONS), i32),
        prev_stats=jnp.zeros((W, A, 4), i32),
        prev_hidden=jnp.zeros((W, A, H), f32),
        food_count=jnp.zeros((W, C, P), i32),
        food_cell=jnp.zeros((W, C, P, 2), i32),
        num_food=jnp.zeros((W,), i32),
        species_counts=jnp.zeros((W, NS), i32),
        species_rewards=jnp.zeros((W, NS), f32),
        step_count=jnp.zeros((), i32),
        world_keys=world_keys,
    )
