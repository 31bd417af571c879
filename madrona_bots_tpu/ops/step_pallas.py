"""Fused Pallas "systems megakernel" — the production TPU step path.

The reference fuses all 16 Step-graph nodes into one megakernel launch
(/root/reference/src/sim/sim.cpp:1061-1181). The jnp spec path
(env/systems.py) expresses every cross-agent interaction as a one-hot
contraction; measured on a v5e chip those contractions cost 10-18 ms each at
8192x128 because XLA materializes the [W, A, A] / [W, A, C] masks through HBM
and lowers the batched matvecs poorly (dtype tricks measured flat — see
artifacts/micro_dot.py). This kernel keeps every mask in VMEM per
world-block and expresses each contraction as a static select-accumulate
loop over the one-hot axis, so the whole systems phase is a few thousand
full-vreg VPU ops per world block.

Bit-parity contract: every dynamics-feeding quantity (damage counts, eat
winners, breed/birth/respawn slot assignment, species counts/health sums) is
INTEGER arithmetic — identical in any evaluation order — and every float
that reaches the state (positions) is a verbatim copy of an input value, so
this path is bit-identical to env/systems.py everywhere except the
`surrounding` observation, which uses the oracle's 4-corner FMA form
(oracle.py::_bilinear) instead of the jnp path's fused-weight einsum
(env/systems.py:391-430) — an observation-only field, tolerance-tested
(SPEC deviation D5 covers the reassociation freedom).
tests/test_step_pallas.py asserts exact equality on everything else.

Slot-allocation trick: per-class free/claim ranks come from ONE byte-packed
lane cumsum (class c counts occupy bits [8c, 8c+8)) instead of the jnp
path's [W, Asub, Asub] rank one-hots — valid while num_species <= 4 and
max_agents / num_species < 256 (asserted at trace time).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from madrona_bots_tpu.config import EnvConfig

i32 = jnp.int32
f32 = jnp.float32


def _col(x: jax.Array, j: int) -> jax.Array:
    """Lane j of [wb, L] as a [wb, 1] column (broadcasts against [wb, L])."""
    return x[:, j:j + 1]


def _lane_cumsum(x: jax.Array, A: int) -> jax.Array:
    """Inclusive cumsum along the lane (last) axis via log2 shifted adds.

    Mosaic-friendly: each step is a lane roll plus a masked add (no
    reduce_window lowering). x: [wb, A] i32."""
    lane = jax.lax.broadcasted_iota(i32, x.shape, 1)
    shift = 1
    while shift < A:
        x = x + jnp.where(lane >= shift, pltpu.roll(x, shift, 1), 0)
        shift *= 2
    return x


def _lane_prefix_or_excl(x: jax.Array, A: int) -> jax.Array:
    """Exclusive prefix-OR along lanes: out[i] = OR of x[j] for j < i."""
    lane = jax.lax.broadcasted_iota(i32, x.shape, 1)
    y = jnp.where(lane >= 1, pltpu.roll(x, 1, 1), 0)
    shift = 1
    while shift < A:
        y = y | jnp.where(lane >= shift, pltpu.roll(y, shift, 1), 0)
        shift *= 2
    return y


# NOTE (r4): a log-rotate "pull gather" (rotate-and-select over the bits of
# each lane's offset) is NOT a valid dynamic gather — after the first stage
# the value a lane pulls was built using the SOURCE lane's offset bits, not
# the destination's, so the composition only holds when idx = lane + const.
# Measured-wrong here (births flipped to respawns); keep the one-hot trip
# loops / bit-packed words for all dynamic-index movement in this kernel.


def _kernel(flags_ref, species_ref, finder_ref, health_ref, posx_ref,
            posy_ref, speedq_ref, cidx_ref, cell_ref, food_ref, drawx_ref,
            drawy_ref,
            hf_ref, he_ref, dmg_ref, eaten_ref, breeder_ref, born_ref,
            bposx_ref, bposy_ref, resp_ref,
            rposx_ref, rposy_ref, surrp_ref, surrm_ref, counts_ref,
            hsum_ref, consumed_ref, *, cfg: EnvConfig,
            ablate: frozenset = frozenset()):
    wb, A = flags_ref.shape
    C = cfg.num_chunks
    P = cfg.max_food_packages
    NS = cfg.num_species
    FL = cfg.respawn_floor

    flags = flags_ref[...]
    alive0 = flags & 1                                    # [wb, A] i32 0/1
    shot_pre = (flags >> 1) & 1
    act_breed = (flags >> 2) & 1
    species = species_ref[...]
    finder = finder_ref[...]
    health0 = health_ref[...]
    cidx = cidx_ref[...]
    lane = jax.lax.broadcasted_iota(i32, (wb, A), 1)
    cls = lane % NS                                       # slot class (D2b)

    # ---- finder target-alive gather via a bit-packed alive mask ----
    # ts needs no gather at all: species-class slots (SPEC D2b) make the
    # target's species (finder % NS) + 1 whenever it is alive, and death
    # zeroes the species field — so ts = ta * (cls(finder) + 1) matches the
    # old pay-table slot sweep bit-for-bit at ~1/10 the ops. ta comes from
    # a 32-bit-packed alive mask: word k holds lanes [32k, 32k+32), and a
    # per-lane variable shift extracts the target's bit.
    if "finder" not in ablate:
        enc_alive = jnp.left_shift(alive0, lane & 31)
        wordi = jnp.right_shift(lane, 5)
        fword = jnp.right_shift(finder, 5)            # -1 -> -1: no match
        gw = jnp.zeros((wb, A), i32)
        for k in range((A + 31) // 32):
            bits_k = jnp.sum(jnp.where(wordi == k, enc_alive, 0),
                             axis=1, keepdims=True)   # [wb, 1]
            gw = jnp.where(fword == k, bits_k, gw)
        ta = jnp.right_shift(gw, finder & 31) & 1     # target alive 0/1
    else:
        ta = jnp.zeros((wb, A), i32)
    ts = ta * (jnp.maximum(finder, 0) % NS + 1)       # target species

    # Quirk D1 (stale finder handle): drop the target-alive requirement.
    valid_shot = shot_pre if cfg.quirk_d1_stale_finder else shot_pre * ta
    hf_ref[...] = valid_shot * (ts == species)
    he_ref[...] = valid_shot * (ts != species)

    # ---- damage histogram: dmg[w, t] = sum_a valid_shot[a]*(finder[a]==t).
    # Pre-masking the index (miss -> -1) drops the per-lane payload
    # broadcast: each trip is one lane extract + compare + add. ----
    finder_eff = jnp.where(valid_shot > 0, finder, -1)
    dmg = jnp.zeros((wb, A), i32)
    if "dmg" not in ablate:
        for a in range(A):
            dmg = dmg + (lane == _col(finder_eff, a)).astype(i32)
    dmg_ref[...] = dmg

    health1 = health0 - jnp.where(alive0 > 0, cfg.shoot_damage * dmg, 0)

    # ---- per-agent food-package payload gather (chunk-indexed) ----
    # food_ref: [wb, 2, C]; channel 0 packs packages 0-2 (10 bits each:
    # has + 2*(cellx + chunk_width*celly)), channel 1 packs packages 3-4.
    food = food_ref[...]                                  # [wb, 2, C]
    g012 = jnp.zeros((wb, A), i32)
    g34 = jnp.zeros((wb, A), i32)
    for c in range(C):
        m = cidx == c
        g012 = jnp.where(m, _col(food[:, 0, :], c), g012)
        g34 = jnp.where(m, _col(food[:, 1, :], c), g34)
    gath = [(g012 >> (10 * p)) & 1023 for p in range(min(P, 3))]
    gath += [(g34 >> (10 * (p - 3))) & 1023 for p in range(3, P)]

    # ---- eat: packages in order, lowest slot wins per chunk ----
    # "Lowest contender slot wins" == "first contender along the lane scan
    # wins": one exclusive prefix-OR over chunk-bit-packed contender masks
    # replaces the per-chunk min reductions (carry-free — each chunk is one
    # bit; winners are unique per chunk so a lane SUM of winner bits is
    # exactly the consumed-bit OR).
    cell = cell_ref[...]                                  # cellx + cw*celly
    in_lo = cidx < 32
    sh_lo = jnp.clip(cidx, 0, 31)
    sh_hi = jnp.clip(cidx - 32, 0, 31)
    bit_lo = jnp.where(in_lo, jnp.left_shift(jnp.int32(1), sh_lo), 0)
    bit_hi = jnp.where(~in_lo & (cidx >= 0),
                       jnp.left_shift(jnp.int32(1), sh_hi), 0)
    eaten = jnp.zeros((wb, A), i32)
    consumed = []                                         # [wb, 2] per pkg
    for p in range(P) if "eat" not in ablate else ():
        has_p = gath[p] & 1
        cell_p = gath[p] >> 1
        contend = ((alive0 > 0) & (has_p > 0) & (eaten == 0)
                   & (cell == cell_p))
        # lo/hi chunk words ride ONE [2*wb, A] prefix pass (stacked on the
        # sublane axis): halves the op count of the dominant prefix-OR
        # chain — bit-identical, the rows are independent.
        enc_lo = jnp.where(contend, bit_lo, 0)
        enc_hi = jnp.where(contend, bit_hi, 0)
        pre2 = _lane_prefix_or_excl(
            jnp.concatenate([enc_lo, enc_hi], axis=0), A)
        pre_lo = pre2[:wb]
        pre_hi = pre2[wb:]
        # Bit-AND against the precomputed chunk bit instead of a per-lane
        # variable right shift (the shift re-derives the same mask).
        taken_before = (pre_lo & bit_lo) | (pre_hi & bit_hi)
        is_winner = contend & (taken_before == 0)
        eaten = eaten | is_winner.astype(i32)
        win2 = jnp.concatenate([jnp.where(is_winner, enc_lo, 0),
                                jnp.where(is_winner, enc_hi, 0)], axis=0)
        csum = jnp.sum(win2, axis=1, keepdims=True)       # [2*wb, 1]
        consumed.append(jnp.concatenate([csum[:wb], csum[wb:]], axis=1))
    if "eat" in ablate:
        consumed = [jnp.zeros((wb, 2), i32) for _ in range(P)]
    consumed_ref[...] = jnp.stack(consumed, axis=1)       # [wb, P, 2]
    eaten_ref[...] = eaten

    health2 = health1 + cfg.eat_health * eaten

    # ---- breed eligibility (post-eat health, sim.cpp:547-569) ----
    ta_ok = (ta >= 0) if cfg.quirk_d1_stale_finder else (ta > 0)
    breeder = ((act_breed > 0) & (alive0 > 0)
               & (health2 > cfg.breed_min_health) & (finder >= 0)
               & ta_ok & (ts == species)).astype(i32)
    breeder_ref[...] = breeder
    health3 = health2 - cfg.breed_cost * breeder
    died = (alive0 > 0) & (health3 <= 0)
    alive_ad = (alive0 > 0) & ~died

    # ---- chunk tallies (post-move positions, step-start alive;
    #      sim.cpp:488-502). Packed count + 512*speed (count <= A <= 256). --
    speedq = speedq_ref[...]
    enc_tally = jnp.where(alive0 > 0, 1 + 512 * speedq, 0)
    tallies = []                                          # [wb, 1] per chunk
    for c in range(C):
        if "tallies" in ablate:
            tallies.append(jnp.zeros((wb, 1), i32))
        else:
            tallies.append(jnp.sum(jnp.where(cidx == c, enc_tally, 0),
                                   axis=1, keepdims=True))

    # ---- birth slot claims (class-partitioned, SPEC D2b) ----
    # Byte-packed per-class lane cumsums: rank of slot i among same-class
    # free slots; rank of breeder a among same-class breeders.
    free = 1 - alive0
    cs_free = _lane_cumsum(free << (8 * cls), A)
    free_rank = ((cs_free >> (8 * cls)) & 255) - 1
    num_free = (_col(cs_free, A - 1) >> (8 * cls)) & 255  # class total
    cs_want = _lane_cumsum(breeder << (8 * cls), A)
    want_rank = ((cs_want >> (8 * cls)) & 255) - 1
    breed_cnt = (_col(cs_want, A - 1) >> (8 * cls)) & 255
    granted = (breeder > 0) & (want_rank < num_free)

    # Match r-th granted breeder of class c -> r-th free slot of class c.
    # `born` needs no matching loop: granted breeders of a class hold the
    # CONSECUTIVE want-ranks 0..grant_cnt-1 (granted = breeder rank <
    # num_free), so grant_cnt = min(#breeders, #free) with no third cumsum,
    # and the r-th free slot is claimed iff r < grant_cnt.
    grant_cnt = jnp.minimum(breed_cnt, num_free)
    born = ((free > 0) & (free_rank < grant_cnt)).astype(i32)
    keyq_parent = jnp.where(granted, cls + NS * want_rank, -1)
    keyq_slot = jnp.where(born > 0, cls + NS * free_rank, -2)
    posx = posx_ref[...]
    posy = posy_ref[...]
    bposx = jnp.zeros((wb, A), f32)
    bposy = jnp.zeros((wb, A), f32)
    for a in range(A) if "birth" not in ablate else ():
        m = keyq_slot == _col(keyq_parent, a)
        bposx = jnp.where(m, _col(posx, a), bposx)
        bposy = jnp.where(m, _col(posy, a), bposy)
    if "birth" in ablate:
        born = jnp.zeros((wb, A), i32)
    born_ref[...] = born
    bposx_ref[...] = bposx
    bposy_ref[...] = bposy

    # ---- surrounding: oracle 4-corner bilinear at POST-BIRTH positions
    # (newborns sit at the parent position, so their value equals the
    # parent's). Corner indices/weights are computed here with the same
    # single-IEEE-op chain as the jnp spec path (env/systems.py:402-421) —
    # division, floor/ceil and subtraction are bit-stable across XLA and
    # Mosaic, so the gathered chunks match exactly. ----
    pfx = jnp.where(born > 0, bposx, posx)
    pfy = jnp.where(born > 0, bposy, posy)
    cw = jnp.float32(cfg.chunk_width)
    chx = (pfx / jnp.float32(cfg.cell_dim) - cw * 0.5) / cw
    chy = (pfy / jnp.float32(cfg.cell_dim) - cw * 0.5) / cw
    fxf = jnp.floor(chx)
    fyf = jnp.floor(chy)
    xi = chx - fxf
    yi = chy - fyf
    corner_f = [(fxf, fyf), (jnp.ceil(chx), fyf), (fxf, jnp.ceil(chy)),
                (jnp.ceil(chx), jnp.ceil(chy))]
    corners = []
    for cxf, cyf in corner_f:
        cx = cxf.astype(i32)
        cy = cyf.astype(i32)
        ok = ((cx >= 0) & (cy >= 0)
              & (cx < cfg.num_chunks_x) & (cy < cfg.num_chunks_y))
        corners.append(jnp.where(ok, cx + cy * cfg.num_chunks_x, -1))
    cg = [jnp.zeros((wb, A), i32) for _ in range(4)]
    for c in range(C) if "surr" not in ablate else ():
        t_c = tallies[c]
        for k in range(4):
            cg[k] = jnp.where(corners[k] == c, t_c, cg[k])
    na = [(x & 511).astype(f32) for x in cg]
    ts_ = [(x >> 9).astype(f32) for x in cg]
    one = f32(1.0)
    na_x0 = xi * na[1] + (one - xi) * na[0]
    na_x1 = xi * na[3] + (one - xi) * na[2]
    ts_x0 = xi * ts_[1] + (one - xi) * ts_[0]
    ts_x1 = xi * ts_[3] + (one - xi) * ts_[2]
    surrp_ref[...] = yi * na_x1 + (one - yi) * na_x0
    surrm_ref[...] = yi * ts_x1 + (one - yi) * ts_x0

    # ---- species counts + health sums (post-birth, pre-respawn) ----
    alive_pb = alive_ad | (born > 0)
    species_pb = jnp.where(born > 0, cls + 1, species)
    health_pb = jnp.where(born > 0, cfg.child_health, health3)
    counts_packed = jnp.sum(jnp.where(alive_pb, 1 << (8 * cls), 0),
                            axis=1, keepdims=True)        # [wb, 1]
    counts_cols = []
    hsum_cols = []
    for s in range(NS):
        counts_cols.append((counts_packed >> (8 * s)) & 255)
        hsum_cols.append(jnp.sum(
            jnp.where(alive_pb & (species_pb == s + 1), health_pb, 0),
            axis=1, keepdims=True))
    counts_ref[...] = jnp.concatenate(counts_cols, axis=1)   # [wb, NS]
    hsum_ref[...] = jnp.concatenate(hsum_cols, axis=1)

    # ---- respawn claims: top class s up to respawn_floor agents ----
    # Births claim exactly the first grant_cnt free slots per class, so
    # the surviving free slots' ranks just shift down — no fourth cumsum.
    free2 = free * (1 - born)
    free2_rank = free_rank - grant_cnt
    needed = jnp.zeros((wb, A), i32)
    for s in range(NS):
        needed = jnp.where(cls == s,
                           jnp.maximum(FL - counts_cols[s], 0), needed)
    respawned = (free2 > 0) & (free2_rank < needed)
    resp_ref[...] = respawned.astype(i32)

    # Draw gather: slot with free2-rank r of class s takes draw (s, r).
    drawx = drawx_ref[...]                                # [wb, NS*FL]
    drawy = drawy_ref[...]
    dkey = jnp.where(respawned, cls * FL + free2_rank, -1)
    rposx = jnp.zeros((wb, A), f32)
    rposy = jnp.zeros((wb, A), f32)
    for k in range(NS * FL) if "respawn" not in ablate else ():
        m = dkey == k
        rposx = jnp.where(m, _col(drawx, k), rposx)
        rposy = jnp.where(m, _col(drawy, k), rposy)
    rposx_ref[...] = rposx
    rposy_ref[...] = rposy


@partial(jax.jit, static_argnames=("cfg", "worlds_per_block", "interpret",
                                  "ablate"))
def systems_pallas(flags, species, finder, health, posx, posy, speedq, cidx,
                   cell, food_packed, drawx, drawy,
                   cfg: EnvConfig, worlds_per_block: int = 128,
                   interpret: bool = False,
                   ablate: frozenset = frozenset()):
    """Run the fused systems kernel; see _kernel for per-ref semantics.

    ablate: MEASUREMENT-ONLY static switch (artifacts/kernelprof.py)
    disabling named sections (finder/dmg/eat/tallies/birth/surr/respawn)
    while keeping every output written, so section costs can be read off
    a timing ablation on hardware. Never set in production paths."""
    W, A = flags.shape
    C, P, NS = cfg.num_chunks, cfg.max_food_packages, cfg.num_species
    assert NS <= 4 and A // NS < 256, "byte-packed rank cumsum bounds"
    assert C <= 64, "2x32 chunk-bit packing bound"
    assert P <= 6, "food packages pack 3 + 3 into two 30-bit channels"
    assert 2 * cfg.chunk_width * cfg.chunk_width + 1 < 1024, \
        "food cell id must fit 10 bits"
    wb = min(worlds_per_block, W)
    while W % wb != 0:
        wb -= 1

    sA = pl.BlockSpec((wb, A), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sFC = pl.BlockSpec((wb, 2, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sP2 = pl.BlockSpec((wb, P, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sD = pl.BlockSpec((wb, NS * cfg.respawn_floor), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    sNS = pl.BlockSpec((wb, NS), lambda i: (i, 0), memory_space=pltpu.VMEM)

    fA = jax.ShapeDtypeStruct((W, A), f32)
    iA = jax.ShapeDtypeStruct((W, A), i32)
    out_shape = (iA, iA, iA, iA, iA, iA,          # hf he dmg eaten breeder born
                 fA, fA,                          # bposx bposy
                 iA, fA, fA,                      # respawned rposx rposy
                 fA, fA,                          # surrp surrm
                 jax.ShapeDtypeStruct((W, NS), i32),
                 jax.ShapeDtypeStruct((W, NS), i32),
                 jax.ShapeDtypeStruct((W, P, 2), i32))
    out_specs = tuple([sA] * 13 + [sNS, sNS, sP2])

    # The default scoped-VMEM budget (16 MB) caps wb at 32; v5e has 128 MB
    # of physical VMEM, and raising the per-kernel limit lets bigger world
    # blocks amortize the kernel's fixed per-op overhead (the unrolled
    # gather/match loops are op-count-bound, not vreg-bound).
    params = (None if interpret else
              pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024))
    return pl.pallas_call(
        partial(_kernel, cfg=cfg, ablate=ablate),
        grid=(W // wb,),
        in_specs=[sA] * 9 + [sFC, sD, sD],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=params,
    )(flags, species, finder, health, posx, posy, speedq, cidx, cell,
      food_packed, drawx, drawy)


# ---------------------------------------------------------------------------
# Fused step: XLA elementwise pre/post + the megakernel in the middle.
# Mirrors env.step_systems (the jnp spec path) state-for-state; the parity
# test (tests/test_step_pallas.py) pins the two together field by field.
# ---------------------------------------------------------------------------

def fused_step_systems(state, cfg: EnvConfig, interpret: bool = False):
    """Drop-in replacement for env.step_systems using the systems kernel."""
    from madrona_bots_tpu.config import (
        ACTION_BACKWARD, ACTION_BREED, ACTION_FORWARD, ACTION_ROTATE_LEFT,
        ACTION_ROTATE_RIGHT, ACTION_SHOOT)
    from madrona_bots_tpu.env import systems

    t = state.step_count
    alive0 = state.alive
    W, A = alive0.shape
    NS = cfg.num_species
    FL = cfg.respawn_floor
    cw = cfg.chunk_width

    # Node 2: food spawn (shared jnp implementation — small [W, C, P] state).
    food_count, food_cell, num_food = systems.food_spawn(
        state.food_count, state.food_cell, state.num_food,
        state.world_keys, t, cfg)

    # Node 3 elementwise piece (rotate/move/clamp, sim.cpp:456-486) —
    # verbatim from systems.action_system so float trajectories match bits.
    act = state.action > 0
    rl = act[..., ACTION_ROTATE_LEFT]
    rr = act[..., ACTION_ROTATE_RIGHT] & ~rl
    delta = jnp.float32(cfg.rotation_delta)
    new_heading = jnp.where(alive0, state.heading + jnp.where(rl, delta, 0.0)
                            - jnp.where(rr, delta, 0.0), state.heading)
    fwd = act[..., ACTION_FORWARD]
    bwd = act[..., ACTION_BACKWARD] & ~fwd
    mv = jnp.where(fwd, cfg.move_speed, 0.0) - jnp.where(bwd, cfg.move_speed, 0.0)
    direction = jnp.stack([jnp.cos(new_heading), jnp.sin(new_heading)], axis=-1)
    new_pos = state.pos + direction * (mv * alive0)[..., None]
    lim = jnp.array([cfg.world_lim_x - 1.0, cfg.world_lim_y - 1.0], f32)
    new_pos = jnp.clip(new_pos, 0.0, lim)
    new_pos = jnp.where(alive0[..., None], new_pos, state.pos)

    d = new_pos - state.pos
    speed_q = (jnp.sqrt(jnp.sum(d * d, axis=-1)) * 2.0).astype(i32)
    cidx = jnp.where(alive0, systems.chunk_index(new_pos, cfg), -1)
    cell2 = systems.cell_in_chunk(new_pos, cfg)
    cell = cell2[..., 0] + cw * cell2[..., 1]

    flags = (alive0.astype(i32)
             + 2 * (act[..., ACTION_SHOOT] & alive0 & (state.finder >= 0)).astype(i32)
             + 4 * act[..., ACTION_BREED].astype(i32))
    # Per-package 10-bit payloads, packed 3 + 3 into two [W, C] channels.
    P = cfg.max_food_packages
    pkg10 = ((food_count > 0).astype(i32)
             + 2 * (food_cell[..., 0] + cw * food_cell[..., 1]))  # [W, C, P]
    ch0 = sum(pkg10[:, :, p] << (10 * p) for p in range(min(P, 3)))
    ch1 = sum(pkg10[:, :, p] << (10 * (p - 3)) for p in range(3, P))
    if not isinstance(ch1, jax.Array):                    # P <= 3
        ch1 = jnp.zeros_like(ch0)
    food_packed = jnp.stack([ch0, ch1], axis=1)           # [W, 2, C]

    draws = systems.respawn_draws(state.world_keys, t, cfg)  # [W, NS, FL, 2]
    drawx = draws[..., 0].reshape(W, NS * FL)
    drawy = draws[..., 1].reshape(W, NS * FL)

    (hf, he, dmg, eaten, breeder, born_i, bposx, bposy,
     resp_i, rposx, rposy, surrp, surrm, counts, hsum, consumed) = \
        systems_pallas(flags, state.species, state.finder, state.health,
                       new_pos[..., 0], new_pos[..., 1], speed_q, cidx, cell,
                       food_packed, drawx, drawy, cfg,
                       interpret=interpret)

    born = born_i > 0
    respawned = resp_i > 0
    cls1 = (jnp.arange(A, dtype=i32) % NS) + 1            # slot class species

    # Health chain (sim.cpp:505-581) — same integer ops as the kernel ran.
    health = jnp.where(alive0, state.health - cfg.shoot_damage * dmg,
                       state.health)
    health = health + cfg.eat_health * eaten
    health = health - cfg.breed_cost * breeder
    died = alive0 & (health <= 0)
    alive_ad = alive0 & ~died
    alive = alive_ad | born | respawned
    new_mask = born | respawned

    health = jnp.where(born, i32(cfg.child_health), health)
    health = jnp.where(respawned, i32(cfg.init_health), health)
    species = jnp.where(new_mask, cls1, state.species)
    heading = jnp.where(new_mask, 0.0, new_heading)
    pos = jnp.where(born[..., None],
                    jnp.stack([bposx, bposy], axis=-1), new_pos)
    pos = jnp.where(respawned[..., None],
                    jnp.stack([rposx, rposy], axis=-1), pos)

    # Species rewards — same float expression as systems.species_info.
    avg_health = jnp.where(counts > 0,
                           hsum.astype(f32) / counts.astype(f32), 0.0)
    rewards = (counts.astype(f32) / jnp.float32(cfg.init_agents)
               + avg_health / 100.0 - 2.0)

    # Surrounding: the kernel evaluated the bilinear at post-birth positions
    # (newborns therefore carry the parent's value already).
    surr = jnp.stack([surrp, surrm], axis=-1)
    alive_pb = alive_ad | born
    surrounding = jnp.where(alive_pb[..., None], surr, 0.0)

    stats = jnp.stack([
        jnp.where(~new_mask, hf, 0),
        jnp.where(~new_mask, he, 0),
        jnp.where(~new_mask, eaten, 0),
        jnp.where(~new_mask, breeder, 0),
    ], axis=-1)

    reward = systems.reward_system(species, health, alive, rewards, stats,
                                   pos, cfg)

    # Food updates: consumed is chunk-bit packed [W, P, 2] (bit c % 32 of
    # channel c // 32); expand to the [W, C, P] map.
    C = cfg.num_chunks
    carange = jnp.arange(C, dtype=i32)
    lo = (consumed[:, :, 0][:, None, :]
          >> jnp.clip(carange, 0, 31)[None, :, None]) & 1
    hi = (consumed[:, :, 1][:, None, :]
          >> jnp.clip(carange - 32, 0, 31)[None, :, None]) & 1
    consumed_cp = jnp.where((carange < 32)[None, :, None], lo, hi)  # [W, C, P]
    food_count = jnp.where(consumed_cp > 0, 0, food_count)
    num_food = num_food - jnp.sum(consumed_cp, axis=(1, 2))

    keep = (alive & ~new_mask)[..., None]
    prev_sensor_depth = jnp.where(keep, state.sensor_depth, 0).astype(jnp.uint8)
    prev_sensor_semantic = jnp.where(keep, state.sensor_semantic, -1).astype(jnp.int8)

    dead = ~alive
    return state.replace(
        pos=jnp.where(dead[..., None], 0.0, pos),
        heading=jnp.where(dead, 0.0, heading),
        health=jnp.where(dead, 0, health),
        alive=alive,
        species=jnp.where(dead, 0, species),
        stats=jnp.where(dead[..., None], 0, stats),
        hidden=jnp.where((dead | new_mask)[..., None], 0.0, state.hidden),
        action=jnp.where((dead | new_mask)[..., None], 0, state.action),
        surrounding=jnp.where(dead[..., None], 0.0,
                              jnp.where(respawned[..., None], 0.0, surrounding)),
        reward=jnp.where(dead, 0.0, reward),
        prev_sensor_depth=prev_sensor_depth,
        prev_sensor_semantic=prev_sensor_semantic,
        food_count=food_count,
        food_cell=food_cell,
        num_food=num_food,
        species_counts=counts,
        species_rewards=rewards,
        step_count=t + 1,
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
