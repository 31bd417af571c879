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
#
# Sublane stacking (r5). Two flavors, with OPPOSITE measured outcomes:
#
# * Stacking DISTINCT data on the sublane axis (the 4 surrounding corners,
#   the 2 food channels, x/y payload pairs) removes redundant compares /
#   selects at zero extra element work — always-on below.
# * Roll-stacking COPIES of one array (to fold S source lanes per trip,
#   _roll_stack) keeps element work constant but pays S-1 rolls + concat
#   copies per array; measured WORSE at every (wb, S) tried on v5e
#   (artifacts/stacksweep.py: wb=128 S=1 4.23 ms vs S=2 4.56, S=4 4.74;
#   wb=32 S=4 5.06 vs S=1 4.72) — Mosaic's per-op issue overhead at
#   [128, 128] ops is ~25% of op cost, not the dominant term. The factors
#   therefore DEFAULT TO 1; the machinery stays for sweeps on other
#   geometries (smaller wb on future hardware may flip the trade). Sole
#   exception: TAL_STACK=4 (4.24 -> 4.18 ms) — the tallies loop is
#   reduction-dominated, and batching 4 chunk reductions into one beats
#   the 3 enc_tally copies. The same trick applied to the finder word
#   sums / per-species health sums measured WORSE (copies of wider data,
#   fewer reductions saved) and was reverted.
DMG_STACK = 1
BIRTH_STACK = 1
RESP_STACK = 1
FOOD_STACK = 1
TAL_STACK = 4
SURR_STACK = 1


def _div_stack(n: int, cap: int) -> int:
    """Largest power of two <= cap that divides n."""
    s = 1
    while s * 2 <= cap and n % (s * 2) == 0:
        s *= 2
    return s


def _roll_stack(x: jax.Array, S: int, step: int) -> jax.Array:
    """[wb, L] -> [S*wb, L']; row-block j is x rolled left by j*step lanes,
    so _col(out, a) reads x[:, a + j*step] in block j (valid for
    a + j*step < L; lanes past L are padding garbage).

    Lane widths that are not a multiple of the 128-lane vreg are padded
    first: Mosaic represents rolls of narrower arrays as lazy lane-offset
    layouts that tpu.concatenate cannot merge ("result/input offset
    mismatch on non-concat dimension"); at >= one full vreg the roll is a
    real lane rotate. The pad costs nothing — a [wb, 48] op already
    occupies full 128-lane vregs."""
    L = x.shape[1]
    Lp = -(-L // 128) * 128
    if Lp != L:
        x = jnp.concatenate(
            [x, jnp.zeros((x.shape[0], Lp - L), x.dtype)], axis=1)
    return jnp.concatenate(
        [x if j == 0 else pltpu.roll(x, -(j * step) % Lp, 1)
         for j in range(S)], axis=0)


def _fold_blocks(x: jax.Array, S: int, wb: int) -> jax.Array:
    """Sum the S row-blocks of [S*wb, L] back to [wb, L] (exact: at most one
    block holds a non-zero per element)."""
    y = x[:wb]
    for j in range(1, S):
        y = y + x[j * wb:(j + 1) * wb]
    return y


def _kernel(alive_ref, species_ref, health_ref, posx_ref,
            posy_ref, speedq_ref, cidx_ref, cell_ref, food_ref, drawx_ref,
            drawy_ref, dmg_ref, breedok_ref, gmax_s,
            eaten_ref, breeder_ref, born_ref,
            bposx_ref, bposy_ref, resp_ref,
            rposx_ref, rposy_ref, surrp_ref, surrm_ref, counts_ref,
            hsum_ref, consumed_ref, *, cfg: EnvConfig,
            ablate: frozenset = frozenset(),
            stacks: tuple | None = None):
    sdmg, sbirth, sresp, sfood, stal, ssurr = (
        stacks if stacks is not None else
        (DMG_STACK, BIRTH_STACK, RESP_STACK, FOOD_STACK, TAL_STACK,
         SURR_STACK))
    wb, A = alive_ref.shape
    C = cfg.num_chunks
    P = cfg.max_food_packages
    NS = cfg.num_species
    FL = cfg.respawn_floor

    alive0 = alive_ref[...]                               # [wb, A] i32 0/1
    species = species_ref[...]
    health0 = health_ref[...]
    cidx = cidx_ref[...]
    lane = jax.lax.broadcasted_iota(i32, (wb, A), 1)
    cls = lane % NS                                       # slot class (D2b)

    # The finder target-alive gather, hit tallies and damage histogram
    # moved OUT of the kernel (r5): they depend only on step-START state
    # (alive0/finder/species/actions), so XLA computes them as fused
    # compare-reduce/elementwise ops at [W, A] scale (fused_step_systems)
    # while this kernel keeps only the parts needing in-kernel feedback
    # (eat contention, post-eat health, slot claims). dmg / breed_ok arrive
    # as inputs; integer arithmetic, so parity is unchanged.
    dmg = dmg_ref[...]
    health1 = health0 - jnp.where(alive0 > 0, cfg.shoot_damage * dmg, 0)

    # ---- per-agent food-package payload gather (chunk-indexed) ----
    # food_ref: [wb, 2, C]; channel 0 packs packages 0-2 (10 bits each:
    # has + 2*(cellx + chunk_width*celly)), channel 1 packs packages 3-4
    # plus the 2-bit eat cell-ranks (bits [20+2p, 22+2p)). Both channels and
    # Sf chunk rolls stack on the sublane axis: one compare+select per trip
    # covers 2*Sf (channel, chunk) pairs.
    food = food_ref[...]                                  # [wb, 2, C]
    Sf = _div_stack(C, sfood)
    Tf = C // Sf
    f2 = jnp.concatenate([food[:, 0, :], food[:, 1, :]], axis=0)  # [2wb, C]
    f_s = _roll_stack(f2, Sf, Tf)                         # [Sf*2wb, C]
    cidx_f = (jnp.concatenate([cidx] * (2 * Sf), axis=0)
              - (jax.lax.broadcasted_iota(i32, (2 * Sf * wb, A), 0)
                 // (2 * wb)) * Tf)
    g_s = jnp.zeros((2 * Sf * wb, A), i32)
    for c in range(Tf):
        g_s = jnp.where(cidx_f == c, _col(f_s, c), g_s)
    g012 = g_s[:wb]
    g34 = g_s[wb:2 * wb]
    for j in range(1, Sf):
        g012 = g012 + g_s[2 * j * wb:(2 * j + 1) * wb]
        g34 = g34 + g_s[(2 * j + 1) * wb:(2 * j + 2) * wb]
    gath = [(g012 >> (10 * p)) & 1023 for p in range(min(P, 3))]
    gath += [(g34 >> (10 * (p - 3))) & 1023 for p in range(3, P)]

    # ---- eat: packages in order, lowest slot wins per chunk ----
    # "Lowest contender slot wins" == "first contender along the lane scan
    # wins": an exclusive prefix-OR over chunk-bit-packed contender masks
    # replaces the per-chunk min reductions (carry-free — each chunk is one
    # bit; winners are unique per chunk so a lane SUM of winner bits is
    # exactly the consumed-bit OR).
    #
    # Packages only interact when they sit on the SAME (chunk, cell): an
    # agent contends exactly for the packages at its own cell, so the
    # sequential `eaten` feedback between package passes only bites between
    # co-celled packages. rank_p — the count of earlier present packages at
    # package p's cell, packed XLA-side as 2 saturated bits in food channel
    # 1 bits [20+2p, 22+2p) — therefore partitions the packages into
    # non-interacting waves: every rank-0 package resolves in ONE fused
    # [2P*wb, A] prefix pass, every rank-1 package in a second (gated on
    # the rank-0 eaten set), and the rare rank>=2 tail (3+ packages stacked
    # on one cell anywhere in the block) falls back to the sequential
    # per-package passes under pl.when.
    cell = cell_ref[...]                                  # cellx + cw*celly
    in_lo = cidx < 32
    sh_lo = jnp.clip(cidx, 0, 31)
    sh_hi = jnp.clip(cidx - 32, 0, 31)
    bit_lo = jnp.where(in_lo, jnp.left_shift(jnp.int32(1), sh_lo), 0)
    bit_hi = jnp.where(~in_lo & (cidx >= 0),
                       jnp.left_shift(jnp.int32(1), sh_hi), 0)
    eaten = jnp.zeros((wb, A), i32)
    if "eat" not in ablate:
        rankp = [(g34 >> (20 + 2 * p)) & 3 for p in range(P)]
        cand = [(alive0 > 0) & ((gath[p] & 1) > 0) & (cell == (gath[p] >> 1))
                for p in range(P)]
        wins = [None] * P
        for r in (0, 1):
            rows = []
            conds = []
            for p in range(P):
                c_p = cand[p] & (rankp[p] == r)
                if r > 0:
                    c_p = c_p & (eaten == 0)
                conds.append(c_p)
                rows.append(jnp.where(c_p, bit_lo, 0))
                rows.append(jnp.where(c_p, bit_hi, 0))
            pre = _lane_prefix_or_excl(jnp.concatenate(rows, axis=0), A)
            new_eat = jnp.zeros((wb, A), i32)
            for p in range(P):
                pre_lo = pre[2 * p * wb:(2 * p + 1) * wb]
                pre_hi = pre[(2 * p + 1) * wb:(2 * p + 2) * wb]
                # Bit-AND against the precomputed chunk bit instead of a
                # per-lane variable right shift.
                taken_before = (pre_lo & bit_lo) | (pre_hi & bit_hi)
                w_p = conds[p] & (taken_before == 0)
                wins[p] = w_p if r == 0 else (wins[p] | w_p)
                new_eat = new_eat | w_p.astype(i32)
            eaten = eaten | new_eat
        consumed = [
            jnp.concatenate(
                [jnp.sum(jnp.where(wins[p], bit_lo, 0), axis=1,
                         keepdims=True),
                 jnp.sum(jnp.where(wins[p], bit_hi, 0), axis=1,
                         keepdims=True)], axis=1)
            for p in range(P)]
        eaten_ref[...] = eaten
        consumed_ref[...] = jnp.stack(consumed, axis=1)   # [wb, P, 2]

        tail = cand[0] & (rankp[0] >= 2)
        for p in range(1, P):
            tail = tail | (cand[p] & (rankp[p] >= 2))

        @pl.when(jnp.any(tail))
        def _rank2_tail():
            eaten_f = eaten_ref[...]
            cons = consumed_ref[...]
            adds = []
            for p in range(P):
                contend = cand[p] & (rankp[p] >= 2) & (eaten_f == 0)
                enc_lo = jnp.where(contend, bit_lo, 0)
                enc_hi = jnp.where(contend, bit_hi, 0)
                pre2 = _lane_prefix_or_excl(
                    jnp.concatenate([enc_lo, enc_hi], axis=0), A)
                taken = (pre2[:wb] & bit_lo) | (pre2[wb:] & bit_hi)
                isw = contend & (taken == 0)
                eaten_f = eaten_f | isw.astype(i32)
                adds.append(jnp.concatenate(
                    [jnp.sum(jnp.where(isw, enc_lo, 0), axis=1,
                             keepdims=True),
                     jnp.sum(jnp.where(isw, enc_hi, 0), axis=1,
                             keepdims=True)], axis=1))
            eaten_ref[...] = eaten_f
            consumed_ref[...] = cons | jnp.stack(adds, axis=1)

        eaten = eaten_ref[...]
    else:
        eaten_ref[...] = eaten
        consumed_ref[...] = jnp.zeros((wb, P, 2), i32)

    health2 = health1 + cfg.eat_health * eaten

    # ---- breed eligibility (post-eat health, sim.cpp:547-569) ----
    # Every step-start condition (breed action, alive, finder valid, target
    # alive + same species) is precomputed XLA-side in breed_ok; only the
    # post-damage/post-eat health test needs the kernel.
    breeder = ((breedok_ref[...] > 0)
               & (health2 > cfg.breed_min_health)).astype(i32)
    breeder_ref[...] = breeder
    health3 = health2 - cfg.breed_cost * breeder
    died = (alive0 > 0) & (health3 <= 0)
    alive_ad = (alive0 > 0) & ~died

    # ---- chunk tallies (post-move positions, step-start alive;
    #      sim.cpp:488-502). Packed count + 512*speed (count <= A <= 256). --
    speedq = speedq_ref[...]
    enc_tally = jnp.where(alive0 > 0, 1 + 512 * speedq, 0)
    if "tallies" not in ablate:
        St = _div_stack(C, stal)
        Tt = C // St
        enc_s = jnp.concatenate([enc_tally] * St, axis=0)  # [St*wb, A]
        cidx_t = (jnp.concatenate([cidx] * St, axis=0)
                  - (jax.lax.broadcasted_iota(i32, (St * wb, A), 0)
                     // wb) * Tt)
        tal_cols = [jnp.sum(jnp.where(cidx_t == c, enc_s, 0),
                            axis=1, keepdims=True)         # [St*wb, 1]
                    for c in range(Tt)]
        tal_stack = jnp.concatenate(tal_cols, axis=1)      # [St*wb, Tt]
        tal = jnp.concatenate([tal_stack[j * wb:(j + 1) * wb]
                               for j in range(St)], axis=1)  # [wb, C]
    else:
        tal = jnp.zeros((wb, C), i32)

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
    posx = posx_ref[...]
    posy = posy_ref[...]
    if "birth" not in ablate and (A // NS) & (A // NS - 1) == 0:
        # Dynamic-rank match (r5): instead of sweeping all A parent lanes,
        # loop over want-RANKS r = 0..max-grant-1 (block max of an XLA-side
        # upper bound, SMEM — typically 1-4 vs A=128 trips). Per rank, the
        # unique granted parent of each class broadcasts its position to
        # every lane of the class via a cyclic same-class rotation sum
        # (strides NS, 2NS, ...: exact — all other lanes contribute 0.0 and
        # positions are clamped to [0, lim], so no -0.0 can flip a sign),
        # and the unique free slot with free_rank == r selects it. Values
        # are verbatim pos copies, so parity with the jnp path holds.
        gb = gmax_s[0, 0]
        for w in range(1, wb):
            gb = jnp.maximum(gb, gmax_s[w, 0])
        grd2 = jnp.concatenate([granted, granted], axis=0)   # [2wb, A]
        wr2 = jnp.concatenate([want_rank, want_rank], axis=0)
        slot2 = jnp.concatenate([born, born], axis=0) > 0
        fr2 = jnp.concatenate([free_rank, free_rank], axis=0)
        pxy = jnp.concatenate([posx, posy], axis=0)          # [2wb, A]

        def rbody(r, bxy):
            sel = jnp.where(grd2 & (wr2 == r), pxy, 0.0)
            s = NS
            while s < A:
                sel = sel + pltpu.roll(sel, s, 1)
                s *= 2
            return jnp.where(slot2 & (fr2 == r), sel, bxy)

        bxy = jax.lax.fori_loop(0, gb, rbody,
                                jnp.zeros((2 * wb, A), f32))
        bposx = bxy[:wb]
        bposy = bxy[wb:]
    elif "birth" not in ablate:
        # Fallback (A/NS not a power of two): static sweep over parent
        # lanes keyed by (class, rank) pairs.
        keyq_parent = jnp.where(granted, cls + NS * want_rank, -1)
        keyq_slot = jnp.where(born > 0, cls + NS * free_rank, -2)
        Sb = _div_stack(A, sbirth)
        Tb = A // Sb
        kp_s = _roll_stack(keyq_parent, Sb, Tb)           # [Sb*wb, A]
        ks_s = jnp.concatenate([keyq_slot] * Sb, axis=0)
        # x/y ride one sublane-stacked payload: one compare + one select
        # per trip moves both coordinates (distinct data — free stacking).
        kp2 = jnp.concatenate([kp_s, kp_s], axis=0)       # [2Sb*wb, A]
        ks2 = jnp.concatenate([ks_s, ks_s], axis=0)
        pxy = jnp.concatenate([_roll_stack(posx, Sb, Tb),
                               _roll_stack(posy, Sb, Tb)], axis=0)
        bxy = jnp.zeros((2 * Sb * wb, A), f32)
        for a in range(Tb):
            m = ks2 == _col(kp2, a)
            bxy = jnp.where(m, _col(pxy, a), bxy)
        bposx = _fold_blocks(bxy[:Sb * wb], Sb, wb)
        bposy = _fold_blocks(bxy[Sb * wb:], Sb, wb)
    else:
        bposx = jnp.zeros((wb, A), f32)
        bposy = jnp.zeros((wb, A), f32)
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
    if "surr" not in ablate:
        Ss = _div_stack(C, ssurr)
        Ts = C // Ss
        # Row order: roll-block-major, corner-minor — [4*Ss*wb, ...].
        t_roll = _roll_stack(tal, Ss, Ts)                  # [Ss*wb, Cpad]
        t_rows = jnp.concatenate(
            [t_roll[j * wb:(j + 1) * wb] for j in range(Ss)
             for _ in range(4)], axis=0)                   # [4Ss*wb, Cpad]
        crn_s = (jnp.concatenate(corners * Ss, axis=0)
                 - (jax.lax.broadcasted_iota(i32, (4 * Ss * wb, A), 0)
                    // (4 * wb)) * Ts)
        cg_s = jnp.zeros((4 * Ss * wb, A), i32)
        for c in range(Ts):
            cg_s = jnp.where(crn_s == c, _col(t_rows, c), cg_s)
        cg = []
        for k in range(4):
            acc = cg_s[k * wb:(k + 1) * wb]
            for j in range(1, Ss):
                acc = acc + cg_s[(4 * j + k) * wb:(4 * j + k + 1) * wb]
            cg.append(acc)
    else:
        cg = [jnp.zeros((wb, A), i32) for _ in range(4)]
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
    if "respawn" not in ablate:
        K = NS * FL
        Sr = _div_stack(K, sresp)
        Tr = K // Sr
        dkey_s = (jnp.concatenate([dkey] * Sr, axis=0)
                  - (jax.lax.broadcasted_iota(i32, (Sr * wb, A), 0)
                     // wb) * Tr)
        # x/y pair-stacked like the birth gather.
        dkey2 = jnp.concatenate([dkey_s, dkey_s], axis=0)  # [2Sr*wb, A]
        dxy = jnp.concatenate([_roll_stack(drawx, Sr, Tr),
                               _roll_stack(drawy, Sr, Tr)], axis=0)
        rxy = jnp.zeros((2 * Sr * wb, A), f32)
        for k in range(Tr):
            rxy = jnp.where(dkey2 == k, _col(dxy, k), rxy)
        rposx = _fold_blocks(rxy[:Sr * wb], Sr, wb)
        rposy = _fold_blocks(rxy[Sr * wb:], Sr, wb)
    else:
        rposx = jnp.zeros((wb, A), f32)
        rposy = jnp.zeros((wb, A), f32)
    rposx_ref[...] = rposx
    rposy_ref[...] = rposy


@partial(jax.jit, static_argnames=("cfg", "worlds_per_block", "interpret",
                                  "ablate", "stacks"))
def systems_pallas(alive0, species, health, posx, posy, speedq, cidx,
                   cell, food_packed, drawx, drawy, dmg, breed_ok, grant_ub,
                   cfg: EnvConfig, worlds_per_block: int = 128,
                   interpret: bool = False,
                   ablate: frozenset = frozenset(),
                   stacks: tuple | None = None):
    """Run the fused systems kernel; see _kernel for per-ref semantics.

    dmg/breed_ok/grant_ub are the XLA-precomputed step-start quantities
    (fused_step_systems): the damage histogram, the health-independent
    breed eligibility, and a per-world upper bound on birth grants (the
    birth match loop's dynamic trip count).

    ablate: MEASUREMENT-ONLY static switch (artifacts/kernelprof.py)
    disabling named sections (eat/tallies/birth/surr/respawn)
    while keeping every output written, so section costs can be read off
    a timing ablation on hardware. Never set in production paths."""
    W, A = alive0.shape
    C, P, NS = cfg.num_chunks, cfg.max_food_packages, cfg.num_species
    assert NS <= 4 and A // NS < 256, "byte-packed rank cumsum bounds"
    assert C <= 64, "2x32 chunk-bit packing bound"
    assert P <= 5, ("food packages pack 3 + 2 ten-bit payloads plus P 2-bit "
                    "cell-ranks into two 30-bit channels")
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
    sG = pl.BlockSpec((wb, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)

    fA = jax.ShapeDtypeStruct((W, A), f32)
    iA = jax.ShapeDtypeStruct((W, A), i32)
    out_shape = (iA, iA, iA,                      # eaten breeder born
                 fA, fA,                          # bposx bposy
                 iA, fA, fA,                      # respawned rposx rposy
                 fA, fA,                          # surrp surrm
                 jax.ShapeDtypeStruct((W, NS), i32),
                 jax.ShapeDtypeStruct((W, NS), i32),
                 jax.ShapeDtypeStruct((W, P, 2), i32))
    out_specs = tuple([sA] * 10 + [sNS, sNS, sP2])

    # The default scoped-VMEM budget (16 MB) caps wb at 32; v5e has 128 MB
    # of physical VMEM, and raising the per-kernel limit lets bigger world
    # blocks amortize the kernel's fixed per-op overhead (the unrolled
    # gather/match loops are op-count-bound, not vreg-bound).
    params = (None if interpret else
              pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024))
    return pl.pallas_call(
        partial(_kernel, cfg=cfg, ablate=ablate, stacks=stacks),
        grid=(W // wb,),
        in_specs=[sA] * 8 + [sFC, sD, sD, sA, sA, sG],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=params,
    )(alive0, species, health, posx, posy, speedq, cidx, cell,
      food_packed, drawx, drawy, dmg, breed_ok, grant_ub)


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

    # ---- finder-dependent step-start quantities (moved out of the kernel,
    # r5): target-alive via a bit-packed alive mask (the kernel's own trick
    # at [W, A] elementwise cost), hit tallies, the damage histogram as a
    # fused compare-reduce, and breed eligibility minus the health test.
    # All integer arithmetic — bit-identical to the old in-kernel sections
    # (tests/test_step_pallas.py pins the composition to env/systems.py). --
    finder = state.finder
    alive_i = alive0.astype(i32)
    lane = jnp.arange(A, dtype=i32)
    # ts needs no gather at all: species-class slots (SPEC D2b) make the
    # target's species (finder % NS) + 1 whenever it is alive, and death
    # zeroes the species field. ta: word k of the packed mask holds lanes
    # [32k, 32k+32); a per-lane variable shift extracts the target's bit.
    enc_alive = alive_i << (lane & 31)[None, :]
    fword = finder >> 5                                   # -1 -> -1: no match
    gw = jnp.zeros((W, A), i32)
    for k in range((A + 31) // 32):
        bits_k = jnp.sum(jnp.where((lane >> 5)[None, :] == k, enc_alive, 0),
                         axis=1, keepdims=True)           # [W, 1]
        gw = jnp.where(fword == k, bits_k, gw)
    ta = (gw >> (finder & 31)) & 1                        # target alive 0/1
    ts = ta * (jnp.maximum(finder, 0) % NS + 1)           # target species
    shot_pre = (act[..., ACTION_SHOOT] & alive0 & (finder >= 0)).astype(i32)
    # Quirk D1 (stale finder handle): drop the target-alive requirement.
    valid_shot = shot_pre if cfg.quirk_d1_stale_finder else shot_pre * ta
    hf = valid_shot * (ts == state.species)
    he = valid_shot * (ts != state.species)
    # Damage histogram dmg[w, t] = #shooters with finder == t: XLA fuses the
    # broadcast compare into the reduce (no [W, A, A] materialization).
    finder_eff = jnp.where(valid_shot > 0, finder, -1)
    dmg = jnp.sum((finder_eff[:, :, None] == lane[None, None, :]).astype(i32),
                  axis=1)                                 # [W, A]
    ta_ok = (ta >= 0) if cfg.quirk_d1_stale_finder else (ta > 0)
    breed_ok = (act[..., ACTION_BREED] & alive0 & (finder >= 0)
                & ta_ok & (ts == state.species)).astype(i32)
    # Per-world upper bound on birth grants (>= the kernel's grant_cnt,
    # which additionally requires post-eat health): the dynamic trip count
    # for the kernel's rank-match loop.
    cls0 = lane % NS
    grant_ub = jnp.zeros((W,), i32)
    for c in range(NS):
        nb = jnp.sum(jnp.where(cls0[None, :] == c, breed_ok, 0), axis=1)
        nf = jnp.sum(jnp.where(cls0[None, :] == c, 1 - alive_i, 0), axis=1)
        grant_ub = jnp.maximum(grant_ub, jnp.minimum(nb, nf))
    grant_ub = grant_ub[:, None]                          # [W, 1]
    # Per-package 10-bit payloads, packed 3 + 3 into two [W, C] channels.
    P = cfg.max_food_packages
    pkg10 = ((food_count > 0).astype(i32)
             + 2 * (food_cell[..., 0] + cw * food_cell[..., 1]))  # [W, C, P]
    ch0 = sum(pkg10[:, :, p] << (10 * p) for p in range(min(P, 3)))
    ch1 = sum(pkg10[:, :, p] << (10 * (p - 3)) for p in range(3, P))
    if not isinstance(ch1, jax.Array):                    # P <= 3
        ch1 = jnp.zeros_like(ch0)
    # Per-package cell-rank (2 saturated bits at ch1 bits [20+2p, 22+2p)):
    # how many earlier PRESENT packages share package p's cell in this
    # chunk. The kernel resolves rank-0/1 packages in two fused prefix
    # passes and only the rank>=2 tail sequentially (see _kernel).
    has = food_count > 0                                  # [W, C, P]
    cellid = food_cell[..., 0] + cw * food_cell[..., 1]
    for p in range(1, P):
        rank_p = sum((has[..., q] & (cellid[..., q] == cellid[..., p]))
                     .astype(i32) for q in range(p))
        ch1 = ch1 + (jnp.minimum(rank_p, 3) << (20 + 2 * p))
    food_packed = jnp.stack([ch0, ch1], axis=1)           # [W, 2, C]

    draws = systems.respawn_draws(state.world_keys, t, cfg)  # [W, NS, FL, 2]
    drawx = draws[..., 0].reshape(W, NS * FL)
    drawy = draws[..., 1].reshape(W, NS * FL)

    (eaten, breeder, born_i, bposx, bposy,
     resp_i, rposx, rposy, surrp, surrm, counts, hsum, consumed) = \
        systems_pallas(alive_i, state.species, state.health,
                       new_pos[..., 0], new_pos[..., 1], speed_q, cidx, cell,
                       food_packed, drawx, drawy, dmg, breed_ok, grant_ub,
                       cfg, interpret=interpret)

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
