"""Step composition — the TPU equivalent of the Madrona taskgraph executor.

The reference runs four launch graphs through `MWCudaExecutor`
(/root/reference/src/entry/mgr.cpp:150-160): Init, Step, Sensor,
ShiftObservations. Here each is one jitted pure function over the `WorldState`
pytree; `Manager::step()`'s "run step graph then sensor graph"
(mgr.cpp:51-63) becomes `step()` = `step_systems` ∘ `sensor_pass`, compiled
as a single XLA program — no host round-trips (the SimBridge offset readbacks,
mgr.cpp:57-62, disappear because shapes are static).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from madrona_bots_tpu.config import EnvConfig
from madrona_bots_tpu.env import systems
from madrona_bots_tpu.env.raycast import raycast
from madrona_bots_tpu.env.state import WorldState, init_state

i32 = jnp.int32
f32 = jnp.float32


def step_systems(state: WorldState, cfg: EnvConfig,
                 use_pallas: bool = False) -> WorldState:
    """The Step graph (sim.cpp:1061-1181) minus the sensor pass.

    With use_pallas=True the whole graph runs through the fused Pallas
    systems megakernel (ops/step_pallas.py) — bit-identical to this path on
    every field except `surrounding` (SPEC deviation D5 reassociation;
    tests/test_step_pallas.py)."""
    if use_pallas:
        from madrona_bots_tpu.ops.step_pallas import fused_step_systems
        return fused_step_systems(state, cfg)
    t = state.step_count
    alive0 = state.alive

    # Node 2: food spawn.
    food_count, food_cell, num_food = systems.food_spawn(
        state.food_count, state.food_cell, state.num_food,
        state.world_keys, t, cfg)

    # Node 3: actions (shoot via previous frame's finder, move, tallies).
    act_out = systems.action_system(
        state.pos, state.heading, alive0, state.species, state.action,
        state.finder, cfg)

    # Node 4: health sync (damage, eat, breed, death, birth).
    h_out = systems.health_sync(
        act_out.pos, act_out.heading, alive0, state.species, state.health,
        state.action, state.finder, act_out.damage,
        food_count, food_cell, num_food, cfg)

    # Node 5: surrounding observation (children included, respawns not yet).
    surrounding = systems.surrounding_observation(
        h_out.pos, h_out.alive, act_out.chunk_agents, act_out.chunk_speed, cfg)

    # Nodes 7-8: species tracking + rewards + respawn. Respawns claim free
    # slots remaining after births (this step's deaths are not reusable).
    free_for_respawn = (~alive0) & (~h_out.born)
    sp_out = systems.species_info(
        h_out.pos, h_out.heading, h_out.alive, h_out.species, h_out.health,
        free_for_respawn, state.world_keys, t, cfg)

    alive = sp_out.alive
    new_mask = h_out.born | sp_out.respawned

    # This step's event flags (AgentStats as read by rewardSystem before the
    # clear, sim.cpp:942-982). New agents have no events.
    old = ~new_mask
    stats = jnp.stack([
        (act_out.hit_friendly & old).astype(i32),
        (act_out.hit_enemy & old).astype(i32),
        (h_out.ate_food & old).astype(i32),
        (h_out.reproduced & old).astype(i32),
    ], axis=-1)

    # Node 14: reward.
    reward = systems.reward_system(
        sp_out.species, sp_out.health, alive, sp_out.rewards, stats,
        sp_out.pos, cfg)

    # Node 13: prev-sensor shift — the previous pass's output follows the
    # agent; fresh agents (and dead slots) get empty sensors (SPEC §8).
    keep = (alive & ~new_mask)[..., None]
    prev_sensor_depth = jnp.where(keep, state.sensor_depth, 0).astype(jnp.uint8)
    prev_sensor_semantic = jnp.where(keep, state.sensor_semantic, -1).astype(jnp.int8)

    # Canonicalize dead slots so trajectories are directly comparable
    # (the reference destroys rows; we zero them).
    dead = ~alive
    return state.replace(
        pos=jnp.where(dead[..., None], 0.0, sp_out.pos),
        heading=jnp.where(dead, 0.0, sp_out.heading),
        health=jnp.where(dead, 0, sp_out.health),
        alive=alive,
        species=jnp.where(dead, 0, sp_out.species),
        stats=jnp.where(dead[..., None], 0, stats),
        hidden=jnp.where((dead | new_mask)[..., None], 0.0, state.hidden),
        action=jnp.where((dead | new_mask)[..., None], 0, state.action),
        surrounding=jnp.where(dead[..., None], 0.0,
                              jnp.where(sp_out.respawned[..., None], 0.0, surrounding)),
        reward=jnp.where(dead, 0.0, reward),
        prev_sensor_depth=prev_sensor_depth,
        prev_sensor_semantic=prev_sensor_semantic,
        food_count=h_out.food_count,
        food_cell=food_cell,
        num_food=h_out.num_food,
        species_counts=sp_out.counts,
        species_rewards=sp_out.rewards,
        step_count=t + 1,
        # Prev twins for fresh agents are zeroed (the reference leaves fresh
        # rows uninitialized; we define zeros — SPEC §4.6).
        prev_species=jnp.where(dead | new_mask, 0, state.prev_species),
        prev_pos=jnp.where((dead | new_mask)[..., None], 0.0, state.prev_pos),
        prev_health=jnp.where(dead | new_mask, 0, state.prev_health),
        prev_surrounding=jnp.where((dead | new_mask)[..., None], 0.0,
                                   state.prev_surrounding),
        prev_reward=jnp.where(dead | new_mask, 0.0, state.prev_reward),
        prev_action=jnp.where((dead | new_mask)[..., None], 0, state.prev_action),
        prev_stats=jnp.where((dead | new_mask)[..., None], 0, state.prev_stats),
        prev_hidden=jnp.where((dead | new_mask)[..., None], 0.0, state.prev_hidden),
    )


def sensor_pass(state: WorldState, cfg: EnvConfig, use_pallas: bool = False) -> WorldState:
    """The Sensor graph (sim.cpp:1183-1188): raycast depth/semantic + finder.

    The Pallas path groups worlds by population before the kernel: the
    kernel's target loop runs to each BLOCK's max alive count, so sorting
    puts similar populations together and every block pays its own cost
    instead of its straggler's. Whole-row world gathers are cheap (the
    pathological TPU gather is lane-axis indexing, not row indexing), and
    the outputs are un-permuted — bit-identical to the unsorted call.
    """
    if use_pallas:
        from madrona_bots_tpu.ops.raycast_pallas import raycast_pallas
        order = jnp.argsort(jnp.sum(state.alive, axis=1))
        inv = jnp.argsort(order)
        depth, semantic, finder = raycast_pallas(
            jnp.take(state.pos, order, axis=0),
            jnp.take(state.heading, order, axis=0),
            jnp.take(state.alive, order, axis=0),
            jnp.take(state.species, order, axis=0), cfg)
        depth = jnp.take(depth, inv, axis=0)
        semantic = jnp.take(semantic, inv, axis=0)
        finder = jnp.take(finder, inv, axis=0)
    else:
        depth, semantic, finder = raycast(
            state.pos, state.heading, state.alive, state.species, cfg)
    return state.replace(
        sensor_depth=depth, sensor_semantic=semantic, finder=finder)


@partial(jax.jit, static_argnames=("cfg", "use_pallas"), donate_argnums=(0,))
def step(state: WorldState, cfg: EnvConfig, use_pallas: bool = False) -> WorldState:
    """One full tick: Step graph then Sensor graph (Manager::step, mgr.cpp:51-63)."""
    return sensor_pass(step_systems(state, cfg, use_pallas), cfg, use_pallas)


def shift_observations_impl(state: WorldState,
                            cfg: EnvConfig | None = None) -> WorldState:
    """The ShiftObservations graph (sim.cpp:1190-1220): cur -> prev for the
    7 obs components + hidden state. Field-to-field by default (deviation
    D4); with cfg.quirk_d4_shift_typo the reference's typo is reproduced:
    prev.hitEnemy receives cur.hitFriendly (sim.cpp:1034)."""
    stats = state.stats
    if cfg is not None and cfg.quirk_d4_shift_typo:
        stats = stats.at[..., 1].set(stats[..., 0])
    return state.replace(
        prev_species=state.species,
        prev_pos=state.pos,
        prev_health=state.health,
        prev_surrounding=state.surrounding,
        prev_reward=state.reward,
        prev_action=state.action,
        prev_stats=stats,
        prev_hidden=state.hidden,
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def shift_observations(state: WorldState, cfg: EnvConfig) -> WorldState:
    return shift_observations_impl(state, cfg)


def set_actions(state: WorldState, actions: jax.Array) -> WorldState:
    """Write the action buffer (the learner's H2D write, mgr.cpp:268-271 /
    training_loop.py:136). actions: [W, A, 6] int32, slot-aligned."""
    return state.replace(action=actions.astype(jnp.int32))


def rollout(state: WorldState, key: jax.Array, num_steps: int,
            policy_fn, cfg: EnvConfig, use_pallas: bool = False):
    """Scan `num_steps` full ticks on device with actions from
    `policy_fn(state, key) -> [W, A, 6] int32` — the zero-host-roundtrip
    rollout shape (each per-tick dispatch costs a full tunnel round trip on
    remote TPU backends; a scanned block costs one). Returns the final state.

    Wrap in jax.jit (donating the state) at the call site, e.g.:
        step_block = jax.jit(lambda s, k: rollout(s, k, 64, pi, cfg, True),
                             donate_argnums=(0,))
    """
    def body(s, k):
        s = set_actions(s, policy_fn(s, k))
        return sensor_pass(step_systems(s, cfg, use_pallas), cfg, use_pallas), ()

    state, _ = jax.lax.scan(body, state, jax.random.split(key, num_steps))
    return state
