"""The per-step simulation systems, vectorized over [num_worlds, max_agents].

Each function here is one "taskgraph node" of the reference Step graph
(/root/reference/src/sim/sim.cpp:1061-1181), re-expressed as pure array ops:

    reference node                      here
    ------------------------------      ---------------------------
    resetChunkInfoSystem (390-417)      (implicit: tallies recomputed)
    addFoodSystem        (307-387)      food_spawn
    actionSystem         (419-502)      action_system
    healthSync           (505-581)      health_sync (damage/eat/breed/death/birth)
    updateSurroundingObservation        surrounding_observation
    speciesTrackerUpdate+InfoSync       species_info (counts/rewards/respawn)
    sort + recycle (1129-1132)          (gone: fixed slots, claim_slots allocator)
    updateSensorOutputIdx (736-789)     prev-sensor shift (in env.step)
    rewardSystem         (840-983)      reward_system
    bridgeSyncSystem     (985-999)      (gone: shapes are static)

CUDA atomics become deterministic reductions (segment sums / scatter-min with
"lowest slot wins" — SPEC.md §3-4); dynamic entity rows become a free-slot
allocator over the padded capacity (SPEC.md deviation D2).

TPU note: there are NO dynamic-index `gather`/`scatter` ops in this hot path.
XLA lowers per-element dynamic indexing along the minor (lane) dimension to a
serial loop on TPU — measured ~450 ms/step at 8192x128 worlds. Every indexed
read/write is instead expressed as a one-hot contraction (`einsum` against a
`idx == iota` mask), which the VPU/MXU executes in a handful of fused passes
(~ms). The contractions are bit-exact: a one-hot row has at most one nonzero,
so each f32 sum has at most one term, and all integer payloads here are far
below 2^24.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from madrona_bots_tpu.config import (
    ACTION_BACKWARD,
    ACTION_BREED,
    ACTION_FORWARD,
    ACTION_ROTATE_LEFT,
    ACTION_ROTATE_RIGHT,
    ACTION_SHOOT,
    EnvConfig,
    SALT_FOOD,
    SALT_RESPAWN,
)

i32 = jnp.int32
f32 = jnp.float32
# Exact dot path for the one-hot contractions: TPU's DEFAULT matmul precision
# rounds f32 operands to single-pass bfloat16 on the MXU, which truncates
# payloads (positions, slot ids > 256, reward floats) and silently breaks the
# bit-exactness argument on the very hardware this module targets. HIGHEST
# (bf16_6x / f32-exact) keeps every one-hot sum exact; CPU is unaffected.
_EXACT = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# One-hot indexing primitives (the TPU replacement for gather/scatter)
# ---------------------------------------------------------------------------

def onehot_mask(idx: jax.Array, n: int) -> jax.Array:
    """[..., n] bool one-hot of idx; any idx outside [0, n) -> all-zero row."""
    return idx[..., None] == jnp.arange(n, dtype=i32)


def onehot_gather(vals: jax.Array, oh: jax.Array) -> jax.Array:
    """Gather vals[w, idx] as a one-hot contraction.

    vals: [W, C] numeric; oh: [W, ..., C] bool one-hot of idx.
    Returns [W, ...] f32 — exact (<=1 nonzero term per sum); zero-row -> 0.
    """
    return jnp.einsum("w...c,wc->w...", oh.astype(f32), vals.astype(f32),
                      precision=_EXACT)


# ---------------------------------------------------------------------------
# Slot allocator (replaces makeEntity/RecycleEntitiesNode, sim.cpp:1132)
# ---------------------------------------------------------------------------

def claim_slots(free_mask: jax.Array, active: jax.Array):
    """Deterministically assign free slots to claimants.

    free_mask: [W, A] bool — slots available for allocation.
    active:    [W, V] bool — claimants in priority order (ascending v).

    Returns (slot_for_v [W, V] i32 with -1 where no slot granted,
             new_free_mask [W, A]).
    The r-th active claimant receives the r-th free slot (both ascending) —
    the deterministic replacement for Madrona's entity-row allocation order.
    """
    W, A = free_mask.shape
    slot_ids_f = jnp.arange(A, dtype=f32)

    free_rank = jnp.cumsum(free_mask.astype(i32), axis=1) - 1        # [W, A]
    num_free = jnp.sum(free_mask.astype(i32), axis=1)                # [W]

    # slot_of_rank[w, r] = index of the r-th free slot in world w (0 if the
    # rank is empty — only ever read at granted ranks, which always exist).
    rank_oh = onehot_mask(jnp.where(free_mask, free_rank, -1), A)    # [W, A, R]
    slot_of_rank = jnp.einsum("war,a->wr", rank_oh.astype(f32), slot_ids_f,
                              precision=_EXACT)

    want_rank = jnp.cumsum(active.astype(i32), axis=1) - 1           # [W, V]
    granted = active & (want_rank < num_free[:, None])
    want_oh = onehot_mask(jnp.where(granted, want_rank, -1), A)      # [W, V, R]
    slot_for_v = jnp.where(
        granted,
        jnp.einsum("wvr,wr->wv", want_oh.astype(f32), slot_of_rank,
                   precision=_EXACT).astype(i32),
        -1,
    )

    claimed = jnp.sum(onehot_mask(slot_for_v, A), axis=1) > 0        # [W, A]
    return slot_for_v, free_mask & ~claimed


def scatter_from_claims(dst: jax.Array, slot_for_v: jax.Array, values: jax.Array):
    """dst[w, slot_for_v[w, v]] = values[w, v] for granted claims (slot >= 0).

    One-hot scatter: slots are unique per world, so the einsum sum has at most
    one term per destination — exact for f32 and for int payloads < 2^24.
    """
    A = dst.shape[1]
    oh = onehot_mask(slot_for_v, A).astype(f32)                      # [W, V, A]
    hit = jnp.sum(oh, axis=1) > 0                                    # [W, A]
    if values.ndim == 3:                                             # [W, V, D]
        contrib = jnp.einsum("wva,wvd->wad", oh, values.astype(f32),
                             precision=_EXACT)
        hit = hit[..., None]
    else:                                                            # [W, V]
        contrib = jnp.einsum("wva,wv->wa", oh, values.astype(f32),
                             precision=_EXACT)
    return jnp.where(hit, contrib.astype(dst.dtype), dst)


# ---------------------------------------------------------------------------
# Geometry helpers (sim.inl:39-63)
# ---------------------------------------------------------------------------

def chunk_index(pos: jax.Array, cfg: EnvConfig) -> jax.Array:
    """Linear chunk index of a world position (always valid post-clamp)."""
    cell = pos / jnp.float32(cfg.cell_dim)
    ch = jnp.floor(cell / jnp.float32(cfg.chunk_width)).astype(i32)
    cx = jnp.clip(ch[..., 0], 0, cfg.num_chunks_x - 1)
    cy = jnp.clip(ch[..., 1], 0, cfg.num_chunks_y - 1)
    return cx + cy * cfg.num_chunks_x


def cell_in_chunk(pos: jax.Array, cfg: EnvConfig) -> jax.Array:
    """Cell (x, y) within the chunk, uint8 semantics of healthSync
    (sim.cpp:518-523): 16 * frac(pos / cell_dim / 16), truncated."""
    chcoord = pos / jnp.float32(cfg.cell_dim) / jnp.float32(cfg.chunk_width)
    frac = chcoord - jnp.floor(chcoord)
    return (jnp.float32(cfg.chunk_width) * frac).astype(i32)


# ---------------------------------------------------------------------------
# Food spawn (addFoodSystem, sim.cpp:307-387)
# ---------------------------------------------------------------------------

def food_spawn(food_count, food_cell, num_food, world_keys, t, cfg: EnvConfig):
    """Per world: 10% gate, 1-2 spawn attempts into first-empty package slots.

    Sequential attempt semantics (attempt 1 sees attempt 0's placement);
    RNG per SPEC.md "RNG discipline".
    """
    P = cfg.max_food_packages

    def draws(wkey):
        k = jax.random.fold_in(jax.random.fold_in(wkey, t), SALT_FOOD)
        gate = jax.random.randint(jax.random.fold_in(k, 0), (), 0, 10)
        n = jax.random.randint(jax.random.fold_in(k, 1), (), 1, 3)
        hi = jnp.array([cfg.num_chunks_x, cfg.num_chunks_y,
                        cfg.chunk_width, cfg.chunk_width])
        per = jnp.stack([
            jax.random.randint(jax.random.fold_in(k, 2 + j), (4,), 0, hi)
            for j in range(2)
        ])  # [2, 4]: chunk_x, chunk_y, cell_x, cell_y
        return gate, n, per

    gate, n, per = jax.vmap(draws)(world_keys)
    n_eff = jnp.minimum(n, jnp.maximum(cfg.total_allowed_food - num_food, 0))
    gate_ok = gate == 0

    C = cfg.num_chunks
    for j in range(2):
        active = gate_ok & (j < n_eff)
        c = per[:, j, 0] + per[:, j, 1] * cfg.num_chunks_x          # [W]
        cell = per[:, j, 2:4].astype(i32)                            # [W, 2]
        chunk_oh = onehot_mask(c, C)                                 # [W, C]
        slots = food_count * chunk_oh[..., None].astype(i32)         # [W, C, P]
        occupied = jnp.sum(slots > 0, axis=1) > 0                    # [W, P] (this chunk)
        has_empty = jnp.any(~occupied, axis=1)
        first_empty = jnp.argmin(occupied.astype(i32), axis=1)       # first False
        place = active & has_empty
        sel = (chunk_oh[:, :, None]
               & onehot_mask(first_empty, P)[:, None, :]
               & place[:, None, None])                               # [W, C, P]
        food_count = jnp.where(sel, 1, food_count)
        food_cell = jnp.where(sel[..., None], cell[:, None, None, :], food_cell)
        num_food = num_food + place.astype(i32)

    return food_count, food_cell, num_food


# ---------------------------------------------------------------------------
# Action system (sim.cpp:419-502)
# ---------------------------------------------------------------------------

class ActionOut(NamedTuple):
    pos: jax.Array            # [W, A, 2] new positions
    heading: jax.Array        # [W, A]
    damage: jax.Array         # [W, A] i32 incoming damage this step
    hit_friendly: jax.Array   # [W, A] bool (shooter stat)
    hit_enemy: jax.Array      # [W, A] bool
    chunk_agents: jax.Array   # [W, C] i32 tally
    chunk_speed: jax.Array    # [W, C] i32 tally


def action_system(pos, heading, alive, species, action, finder, cfg: EnvConfig) -> ActionOut:
    W, A = alive.shape
    act = action > 0

    # --- shoot: damage via previous frame's crosshair (sim.cpp:434-454).
    # Target lookups and damage accumulation are one-hot contractions over the
    # finder index (finder == -1 -> all-zero row); the damage einsum sums all
    # shooters per target — the order-free integer sum that replaces the
    # reference's atomic adds. ---
    finder_oh = onehot_mask(finder, A)                               # [W, A, T]
    target_alive = onehot_gather(alive, finder_oh) > 0
    target_species = onehot_gather(species, finder_oh).astype(i32)
    # Quirk D1: the reference follows the previous frame's entity handle
    # without re-checking liveness (stale-handle UB, sim.cpp:434-454); the
    # emulation drops the target-alive requirement (a dead slot absorbs the
    # shot as a no-op since dead health never updates).
    ta_ok = jnp.ones_like(target_alive) if cfg.quirk_d1_stale_finder \
        else target_alive
    valid_shot = act[..., ACTION_SHOOT] & alive & (finder >= 0) & ta_ok
    damage = jnp.einsum(
        "wat,wa->wt", finder_oh.astype(f32),
        jnp.where(valid_shot, f32(cfg.shoot_damage), 0.0),
        precision=_EXACT).astype(i32)
    same = target_species == species
    hit_friendly = valid_shot & same
    hit_enemy = valid_shot & ~same

    # --- rotate (if/elif, sim.cpp:456-462) ---
    rl = act[..., ACTION_ROTATE_LEFT]
    rr = act[..., ACTION_ROTATE_RIGHT] & ~rl
    delta = jnp.float32(cfg.rotation_delta)
    new_heading = jnp.where(alive, heading + jnp.where(rl, delta, 0.0)
                            - jnp.where(rr, delta, 0.0), heading)

    # --- move (if/elif) + clamp (sim.cpp:464-486) ---
    fwd = act[..., ACTION_FORWARD]
    bwd = act[..., ACTION_BACKWARD] & ~fwd
    mv = jnp.where(fwd, cfg.move_speed, 0.0) - jnp.where(bwd, cfg.move_speed, 0.0)
    direction = jnp.stack([jnp.cos(new_heading), jnp.sin(new_heading)], axis=-1)
    new_pos = pos + direction * (mv * alive)[..., None]
    lim = jnp.array([cfg.world_lim_x - 1.0, cfg.world_lim_y - 1.0], f32)
    new_pos = jnp.clip(new_pos, 0.0, lim)
    new_pos = jnp.where(alive[..., None], new_pos, pos)

    # --- chunk tallies at NEW positions (sim.cpp:488-502), integer sums
    # expressed as one-hot contractions over the chunk index ---
    d = new_pos - pos
    delta_len = jnp.sqrt(jnp.sum(d * d, axis=-1))
    speed_q = (delta_len * 2.0).astype(i32)  # uint32 truncation in the reference
    cidx = jnp.where(alive, chunk_index(new_pos, cfg), -1)  # dead -> zero row
    chunk_oh = onehot_mask(cidx, cfg.num_chunks).astype(f32)  # [W, A, C]
    chunk_agents = jnp.einsum("wac,wa->wc", chunk_oh, alive.astype(f32),
                              precision=_EXACT).astype(i32)
    chunk_speed = jnp.einsum("wac,wa->wc", chunk_oh,
                             jnp.where(alive, speed_q, 0).astype(f32),
                             precision=_EXACT).astype(i32)

    return ActionOut(new_pos, new_heading, damage, hit_friendly, hit_enemy,
                     chunk_agents, chunk_speed)


# ---------------------------------------------------------------------------
# Health sync: damage, eat, breed, death, birth (sim.cpp:505-581)
# ---------------------------------------------------------------------------

class HealthOut(NamedTuple):
    health: jax.Array        # [W, A] i32
    alive: jax.Array         # [W, A] post-death, post-birth
    born: jax.Array          # [W, A] bool — slots that hold a newborn
    ate_food: jax.Array      # [W, A] bool
    reproduced: jax.Array    # [W, A] bool
    food_count: jax.Array
    num_food: jax.Array
    pos: jax.Array           # with newborn positions
    heading: jax.Array
    species: jax.Array


def health_sync(pos, heading, alive, species, health, action, finder, damage,
                food_count, food_cell, num_food, cfg: EnvConfig) -> HealthOut:
    W, A = alive.shape
    C = cfg.num_chunks
    act = action > 0

    health = jnp.where(alive, health - damage, health)

    # --- eat: package slots processed in order, lowest agent slot wins each
    # (deterministic replacement for the CAS race, sim.inl:76-99). All
    # chunk-indexed reads and the per-chunk winner min-reduction run as
    # one-hot contractions over the agent's chunk (no gather/scatter). ---
    cidx = jnp.where(alive, chunk_index(pos, cfg), -1)
    chunk_oh = onehot_mask(cidx, C)                                  # [W, A, C]
    chunk_oh_f = chunk_oh.astype(f32)
    cell = cell_in_chunk(pos, cfg)                                   # [W, A, 2]
    eaten = jnp.zeros((W, A), bool)
    slot_ids = jnp.broadcast_to(jnp.arange(A, dtype=i32), (W, A))
    BIG = i32(A)
    for p in range(cfg.max_food_packages):
        # Three separate matvec-shaped gathers (NOT one [.., 3] contraction:
        # an N=3 dot pads to a full MXU matmul, while N=1 contractions get
        # strength-reduced to fused VPU multiply-reduce).
        pkg_x = onehot_gather(food_cell[:, :, p, 0], chunk_oh).astype(i32)
        pkg_y = onehot_gather(food_cell[:, :, p, 1], chunk_oh).astype(i32)
        pkg_has = onehot_gather(food_count[:, :, p] > 0, chunk_oh) > 0
        contend = (alive & pkg_has & ~eaten
                   & (cell[..., 0] == pkg_x) & (cell[..., 1] == pkg_y))
        key = jnp.where(contend, slot_ids, BIG)
        winner_per_chunk = jnp.min(
            jnp.where(chunk_oh & contend[..., None], key[..., None], BIG),
            axis=1)                                                  # [W, C]
        winner_here = onehot_gather(winner_per_chunk, chunk_oh).astype(i32)
        is_winner = contend & (slot_ids == winner_here)
        eaten = eaten | is_winner
        health = health + jnp.where(is_winner, cfg.eat_health, 0)
        consumed_chunk = winner_per_chunk < BIG                      # [W, C]
        food_count = jnp.where(
            consumed_chunk[..., None]
            & (jnp.arange(cfg.max_food_packages) == p),
            0, food_count)
        num_food = num_food - jnp.sum(consumed_chunk, axis=1)

    # --- breed (sim.cpp:547-569): post-damage, post-eat health; crosshair
    # target must be alive (at step start) and same species (quirk D1 drops
    # the liveness check — dead slots hold species 0, so breeding into a
    # dead crosshair still fails on the species test) ---
    finder_oh = onehot_mask(finder, A)
    target_alive = onehot_gather(alive, finder_oh) > 0
    target_species = onehot_gather(species, finder_oh).astype(i32)
    ta_ok = jnp.ones_like(target_alive) if cfg.quirk_d1_stale_finder \
        else target_alive
    breeder = (act[..., ACTION_BREED] & alive & (health > cfg.breed_min_health)
               & (finder >= 0) & ta_ok & (target_species == species))
    health = health - jnp.where(breeder, cfg.breed_cost, 0)

    # --- death (sim.cpp:574-578) ---
    died = alive & (health <= 0)
    alive_after_death = alive & ~died

    # --- births claim slots free at step start (recycle runs later in the
    # reference graph, so this step's deaths are not reusable — SPEC §4.6).
    # Slots are species-class partitioned (deviation D2b): a child claims a
    # free slot of its parent's class, ascending parent order within the
    # class. Claims run on the [W, A/NS] per-class views — 16x smaller
    # allocator einsums and the class invariant the learner exploits. ---
    NS = cfg.num_species
    Asub = A // NS
    free3 = (~alive).reshape(W, Asub, NS)
    breeder3 = breeder.reshape(W, Asub, NS)
    pos3 = pos.reshape(W, Asub, NS, 2)
    species3 = species.reshape(W, Asub, NS)
    born_c, pos_c, species_c = [], [], []
    for c in range(NS):
        slot_c, _ = claim_slots(free3[:, :, c], breeder3[:, :, c])
        born_c.append(jnp.sum(onehot_mask(slot_c, Asub), axis=1) > 0)
        pos_c.append(scatter_from_claims(pos3[:, :, c], slot_c, pos3[:, :, c]))
        species_c.append(
            scatter_from_claims(species3[:, :, c], slot_c, species3[:, :, c]))
    born = jnp.stack(born_c, axis=2).reshape(W, A)
    pos = jnp.stack(pos_c, axis=2).reshape(W, A, 2)
    species = jnp.stack(species_c, axis=2).reshape(W, A)
    heading = jnp.where(born, 0.0, heading)
    health = jnp.where(born, i32(cfg.child_health), health)
    # The reference sets reproduced=1 whenever the breed branch fires
    # (allocation never fails there); under capacity pressure we still report
    # reproduced for the stat/bonus even if the birth was dropped.
    reproduced = breeder

    alive_new = alive_after_death | born
    return HealthOut(health, alive_new, born, eaten, breeder,
                     food_count, num_food, pos, heading, species)


# ---------------------------------------------------------------------------
# Surrounding observation (sim.cpp:583-654)
# ---------------------------------------------------------------------------

def surrounding_observation(pos, alive, chunk_agents, chunk_speed, cfg: EnvConfig):
    """Bilinear interpolation of chunk tallies at the agent position.

    The 4 corner contributions collapse into ONE per-agent weight row over
    the chunks (coefficients summed where corners coincide — the integral-
    coordinate double-count of the reference, sim.cpp:626-634, falls out of
    the addition), so the whole system is 4 masked weight accumulations plus
    two [W, A, C] x [W, C] contractions instead of 8 separate lookups.
    Reassociates the f32 bilinear sum (within test tolerance; surrounding
    feeds only observations, never dynamics)."""
    cw = jnp.float32(cfg.chunk_width)
    cell = pos / jnp.float32(cfg.cell_dim) - cw * 0.5
    ch = cell / cw                                                  # [W, A, 2]
    ch0 = jnp.floor(ch)
    xi = ch[..., 0] - ch0[..., 0]
    yi = ch[..., 1] - ch0[..., 1]

    fx, fy = ch0[..., 0], ch0[..., 1]
    cx_, cy_ = jnp.ceil(ch[..., 0]), jnp.ceil(ch[..., 1])

    weights = None
    for cxf, cyf, coeff in (
        (fx, fy, (1.0 - xi) * (1.0 - yi)),
        (cx_, fy, xi * (1.0 - yi)),
        (fx, cy_, (1.0 - xi) * yi),
        (cx_, cy_, xi * yi),
    ):
        cx = cxf.astype(i32)
        cy = cyf.astype(i32)
        ok = (cx >= 0) & (cy >= 0) & (cx < cfg.num_chunks_x) & (cy < cfg.num_chunks_y)
        lin = jnp.where(ok, cx + cy * cfg.num_chunks_x, -1)          # -1 -> zero row
        contrib = onehot_mask(lin, cfg.num_chunks).astype(f32) * coeff[..., None]
        weights = contrib if weights is None else weights + contrib  # [W, A, C]

    presence = jnp.einsum("wac,wc->wa", weights, chunk_agents.astype(f32),
                          precision=_EXACT)
    movement = jnp.einsum("wac,wc->wa", weights, chunk_speed.astype(f32),
                          precision=_EXACT)
    out = jnp.stack([presence, movement], axis=-1)
    return jnp.where(alive[..., None], out, 0.0)


# ---------------------------------------------------------------------------
# Species info: counts, rewards, respawn (sim.cpp:719-838)
# ---------------------------------------------------------------------------

class SpeciesOut(NamedTuple):
    counts: jax.Array          # [W, NS] pre-respawn (exported SpeciesCount)
    rewards: jax.Array         # [W, NS]
    alive: jax.Array           # [W, A] post-respawn
    respawned: jax.Array       # [W, A] bool
    pos: jax.Array
    heading: jax.Array
    species: jax.Array
    health: jax.Array


def respawn_draws(world_keys, t, cfg: EnvConfig) -> jax.Array:
    """Respawn position draws, [W, NS, respawn_floor, 2] f32.

    Shared by the jnp spec path (species_info) and the fused Pallas path
    (ops/step_pallas.py) so both consume the identical RNG stream
    (SPEC.md "RNG discipline", SALT_RESPAWN)."""
    NS = cfg.num_species
    floor_n = cfg.respawn_floor

    def draw(wkey):
        base = jax.random.fold_in(jax.random.fold_in(wkey, t), SALT_RESPAWN)
        lims = jnp.array([cfg.world_lim_x, cfg.world_lim_y], f32)
        return jnp.stack([
            jax.random.uniform(jax.random.fold_in(base, s), (floor_n, 2), f32) * lims
            for s in range(NS)
        ])  # [NS, floor_n, 2]

    return jax.vmap(draw)(world_keys)


def species_info(pos, heading, alive, species, health, born_free_mask,
                 world_keys, t, cfg: EnvConfig) -> SpeciesOut:
    W, A = alive.shape
    NS = cfg.num_species
    floor_n = cfg.respawn_floor

    sp1 = species - 1  # 0-based; dead slots masked below
    onehot = (sp1[..., None] == jnp.arange(NS)) & alive[..., None]   # [W, A, NS]
    counts = jnp.sum(onehot, axis=1).astype(i32)
    total_health = jnp.sum(jnp.where(onehot, health[..., None], 0), axis=1).astype(i32)

    avg_health = jnp.where(counts > 0, total_health.astype(f32) / counts.astype(f32), 0.0)
    rewards = (counts.astype(f32) / jnp.float32(cfg.init_agents)
               + avg_health / 100.0 - 2.0)

    # Respawn (sim.cpp:825-836): top species s up to floor_n agents. Each
    # species claims free slots of its own class (deviation D2b) on the
    # [W, A/NS] per-class view.
    needed = jnp.where(counts < floor_n, floor_n - counts, 0)        # [W, NS]

    draws = respawn_draws(world_keys, t, cfg)                        # [W, NS, fl, 2]

    Asub = A // NS
    free3 = born_free_mask.reshape(W, Asub, NS)
    pos3 = pos.reshape(W, Asub, NS, 2)
    species3 = species.reshape(W, Asub, NS)
    heading3 = heading.reshape(W, Asub, NS)
    health3 = health.reshape(W, Asub, NS)
    rsp_c, pos_c, sp_c, hd_c, hl_c = [], [], [], [], []
    for s in range(NS):
        active_s = (jnp.arange(floor_n, dtype=i32)[None, :]
                    < needed[:, s:s + 1])                            # [W, fl]
        slot_s, _ = claim_slots(free3[:, :, s], active_s)
        rsp = jnp.sum(onehot_mask(slot_s, Asub), axis=1) > 0         # [W, Asub]
        rsp_c.append(rsp)
        pos_c.append(scatter_from_claims(pos3[:, :, s], slot_s, draws[:, s]))
        sp_c.append(jnp.where(rsp, i32(s + 1), species3[:, :, s]))
        hd_c.append(jnp.where(rsp, 0.0, heading3[:, :, s]))
        hl_c.append(jnp.where(rsp, i32(cfg.init_health), health3[:, :, s]))
    respawned = jnp.stack(rsp_c, axis=2).reshape(W, A)
    pos = jnp.stack(pos_c, axis=2).reshape(W, A, 2)
    species = jnp.stack(sp_c, axis=2).reshape(W, A)
    heading = jnp.stack(hd_c, axis=2).reshape(W, A)
    health = jnp.stack(hl_c, axis=2).reshape(W, A)

    return SpeciesOut(counts, rewards, alive | respawned, respawned,
                      pos, heading, species, health)


# ---------------------------------------------------------------------------
# Reward (sim.cpp:840-983) — all 8 settings, default SETTING_8
# ---------------------------------------------------------------------------

def reward_system(species, health, alive, species_rewards, stats, pos,
                  cfg: EnvConfig):
    """Per-agent reward. Uses rewards[species-1] (deviation D3 — the reference
    OOB-indexes rewards[species], sim.cpp:943). `stats` are THIS step's event
    flags (the reference clears AgentStats right after reading them,
    sim.cpp:979-982, so they are per-step flags). Returns reward [W, A] f32."""
    W, A = alive.shape
    setting = int(cfg.reward_setting)
    if cfg.quirk_d3_oob_reward:
        # Reference indexes rewards[speciesID] with speciesID in 1..NS on an
        # [NS] array (sim.cpp:943): species s reads species s+1's reward and
        # species NS reads out of bounds — emulated as a clamped read.
        sp0 = jnp.clip(species, 0, cfg.num_species - 1)
    else:
        sp0 = jnp.clip(species - 1, 0, cfg.num_species - 1)
    base = onehot_gather(species_rewards, onehot_mask(sp0, cfg.num_species))
    pop_health = base + health.astype(f32) / 100.0 - 0.5

    hit_friendly = stats[..., 0] > 0
    hit_enemy = stats[..., 1] > 0
    ate = stats[..., 2] > 0
    repro = stats[..., 3] > 0

    if setting in (2,):
        r = pop_health
        lim_x, lim_y, pr = cfg.world_lim_x, cfg.world_lim_y, 4.0
        at_edge = ((pos[..., 0] < pr) | (pos[..., 1] < pr)
                   | (pos[..., 0] > lim_x - pr) | (pos[..., 1] > lim_y - pr))
        r = r - jnp.where(at_edge, 1.0, 0.0)
        r = r + jnp.where(repro, 10.0, 0.0) - jnp.where(hit_friendly, 5.0, 0.0)
        r = r + jnp.where(hit_enemy, 15.0, 0.0) + jnp.where(ate, 7.0, 0.0)
    elif setting == 3:
        r = (jnp.where(repro, 10.0, 0.0) + jnp.where(hit_enemy, 15.0, 0.0)
             + jnp.where(ate, 7.0, 0.0))
    elif setting == 4:
        r = (jnp.where(repro, 10.0, 0.0) + jnp.where(hit_enemy, 15.0, 0.0)
             - jnp.where(hit_friendly, 5.0, 0.0) + jnp.where(ate, 7.0, 0.0))
    elif setting == 5:
        r = pop_health
    elif setting == 6:
        r = pop_health + jnp.where(ate, 10.0, 0.0)
    elif setting == 7:
        r = pop_health + jnp.where(ate, 10.0, 0.0) + jnp.where(repro, 10.0, 0.0)
    elif setting == 9:  # SETTING_7B — trailing block (sim.cpp:959-977)
        r = (pop_health + jnp.where(repro, 10.0, 0.0)
             - jnp.where(hit_friendly, 5.0, 0.0)
             + jnp.where(hit_enemy, 15.0, 0.0) + jnp.where(ate, 7.0, 0.0))
    else:  # SETTING_8 — the active one (sim.cpp:942-957)
        r = (pop_health + jnp.where(ate, 10.0, 0.0) + jnp.where(repro, 10.0, 0.0)
             + jnp.where(hit_enemy, 15.0, 0.0))

    return jnp.where(alive, r, 0.0)
