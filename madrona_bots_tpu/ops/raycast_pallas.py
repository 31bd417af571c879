"""Pallas TPU raycast kernel — the production sensor pass.

Same geometry as env/raycast.py (the jnp reference; SPEC.md "Sensor pass"),
restructured for the TPU memory hierarchy: the XLA fori_loop version streams
[W, A, S]-sized carries through HBM on every one of the A target iterations
(~600 ms at 8192x128 on v5e). Here each grid step owns a block of worlds,
holds everything in VMEM, and the target loop runs entirely on-chip —
the kernel is VPU-compute-bound instead of HBM-bound.

Structure: a fori_loop over rank-compacted ALIVE target slots (dynamic trip
count = the block's max population — dead slots can never be hit, so the
dominant loop shrinks from capacity A to population size); inside, a static
loop over the worlds of the block. Per (world, target) the target's scalars
are read from SMEM (dynamic *scalar* loads are lowerable where dynamic
lane-dim vector loads are not) and broadcast into [S, A] tiles (rays x
source agents — A=128 fills the lane dimension exactly). Species/finder
values are carried through the min-reduction directly, so no gather is
needed at the end. Compaction preserves ascending slot order, so the
running-min tie-break matches a full slot sweep bit-for-bit.

Validated elementwise against env/raycast.py in tests/test_raycast.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from madrona_bots_tpu.config import EnvConfig
from madrona_bots_tpu.env.raycast import ray_angle_offsets

_INF = 3.0e38  # python float: folds into kernel ops without const capture


def _kernel(posx_ref, posy_ref, heading_ref, alive_ref, offs_ref,
            posx_s, posy_s, species_s, compact_s, nalive_s,
            depth_ref, semantic_ref, finder_ref,
            *, cfg: EnvConfig, wb: int):
    S = cfg.sensor_size
    A = posx_ref.shape[1]
    r2 = jnp.float32(cfg.agent_radius * cfg.agent_radius)
    near = jnp.float32(cfg.near)

    offs = offs_ref[...].reshape(S, 1)                           # [S, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, A), 1)        # [1, A]

    # Per-world precomputation (static unroll over the world block).
    px, py, cos_a, sin_a, cos_h, sin_h, alive_w = [], [], [], [], [], [], []
    for w in range(wb):
        pxw = posx_ref[w:w + 1, :]                               # [1, A]
        pyw = posy_ref[w:w + 1, :]
        hw = heading_ref[w:w + 1, :]
        ang = hw + offs                                          # [S, A]
        px.append(pxw)
        py.append(pyw)
        cos_a.append(jnp.cos(ang))
        sin_a.append(jnp.sin(ang))
        cos_h.append(jnp.cos(hw))
        sin_h.append(jnp.sin(hw))
        alive_w.append(alive_ref[w:w + 1, :] != 0)

    # The target loop runs over COMPACTED alive slots only (rank-compacted
    # ascending, so the running-min tie-break order matches a full slot
    # sweep), with a dynamic trip count = max alive count in the block.
    # Dead targets can never hit (ok would be false), so skipping them is
    # output-identical and cuts the dominant cost from A to pop-size
    # iterations.
    n_max = nalive_s[0, 0]
    for w in range(1, wb):
        n_max = jnp.maximum(n_max, nalive_s[w, 0])

    def visit(b, carry):
        """Fold one (possibly out-of-range) target into the running mins."""
        t_min, sem_min, f_min, f_arg = carry
        # The unrolled driver can pass b >= A when n_max is not a multiple
        # of the unroll factor at full population; clamp the SMEM reads
        # (in_range keeps b's true value so the clamped lane contributes
        # nothing).
        b_safe = jnp.minimum(b, A - 1)
        new_t, new_sem, new_f, new_fa = [], [], [], []
        for w in range(wb):
            in_range = b < nalive_s[w, 0]                        # scalar bool
            slot = compact_s[w, b_safe]                          # scalar i32
            tx = posx_s[w, slot]                                 # scalars
            ty = posy_s[w, slot]
            t_species = species_s[w, slot]

            ocx = tx - px[w]                                     # [1, A]
            ocy = ty - py[w]
            oc2 = ocx * ocx + ocy * ocy
            ok = in_range & (lane != slot)                       # [1, A]
            # q folds the radius test AND the exclusion mask: excluded lanes
            # get q = -inf so disc = t_c^2 + q stays negative — one [1, A]
            # select instead of two [S, A] mask ops.
            q = jnp.where(ok, r2 - oc2, -_INF)                   # [1, A]

            # Sensor fan: [S, A]. Validity (disc >= 0, t > near) folds into
            # a single select-to-INF, so the winner test is ONE compare.
            # (The semantic carry stays int32: Mosaic cannot relayout an
            # f32-compare mask to the int8 select tiling.)
            t_c = cos_a[w] * ocx + sin_a[w] * ocy
            disc = t_c * t_c + q
            t_hit = t_c - jnp.sqrt(jnp.maximum(disc, 0.0))
            thit_v = jnp.where((disc >= 0) & (t_hit > near), t_hit, _INF)
            closer = thit_v < t_min[w]
            new_t.append(jnp.minimum(thit_v, t_min[w]))
            new_sem.append(jnp.where(closer, t_species, sem_min[w]))

            # Crosshair (finder) ray: [1, A].
            ft_c = cos_h[w] * ocx + sin_h[w] * ocy
            fdisc = ft_c * ft_c + q
            ft = ft_c - jnp.sqrt(jnp.maximum(fdisc, 0.0))
            ft_v = jnp.where((fdisc >= 0) & (ft > near), ft, _INF)
            fcloser = ft_v < f_min[w]
            new_f.append(jnp.minimum(ft_v, f_min[w]))
            new_fa.append(jnp.where(fcloser, slot, f_arg[w]))
        return tuple(new_t), tuple(new_sem), tuple(new_f), tuple(new_fa)

    # Unroll 4 targets per trip: the loop carry is 4*wb VMEM tiles whose
    # re-threading costs as much as the compute — visiting four (sequential,
    # order-preserving; each predicated by its own in_range check) targets
    # per iteration amortizes that overhead.
    def body(i, carry):
        for j in range(4):
            carry = visit(4 * i + j, carry)
        return carry

    t0 = tuple(jnp.full((S, A), _INF, jnp.float32) for _ in range(wb))
    s0 = tuple(jnp.zeros((S, A), jnp.int32) for _ in range(wb))
    f0 = tuple(jnp.full((1, A), _INF, jnp.float32) for _ in range(wb))
    a0 = tuple(jnp.full((1, A), -1, jnp.int32) for _ in range(wb))
    t_agent, sem_agent, f_t, f_arg = jax.lax.fori_loop(
        0, (n_max + 3) // 4, body, (t0, s0, f0, a0))

    limx = jnp.float32(cfg.world_lim_x)
    limy = jnp.float32(cfg.world_lim_y)
    scale = jnp.float32(255.0 / cfg.max_range)
    safe = lambda d: jnp.where(d == 0, 1.0, d)

    for w in range(wb):
        # Walls: x = 0 / lim_x, y = 0 / lim_y.
        ca, sa = cos_a[w], sin_a[w]
        tx_w = jnp.minimum(
            jnp.where(ca > 0, (limx - px[w]) / safe(ca), _INF),
            jnp.where(ca < 0, -px[w] / safe(ca), _INF))
        ty_w = jnp.minimum(
            jnp.where(sa > 0, (limy - py[w]) / safe(sa), _INF),
            jnp.where(sa < 0, -py[w] / safe(sa), _INF))
        t_wall = jnp.minimum(tx_w, ty_w)
        t_wall = jnp.where(t_wall > near, t_wall, _INF)

        agent_wins = t_agent[w] < t_wall
        t = jnp.minimum(t_agent[w], t_wall)
        any_hit = t < _INF
        semantic = jnp.where(any_hit,
                             jnp.where(agent_wins, sem_agent[w], 0), -1)
        db = 255 - jnp.minimum(jnp.floor(t * scale), 255.0).astype(jnp.int32)
        depth = jnp.where(any_hit, db, 0)

        src_alive = alive_w[w]                                   # [1, A]
        depth_ref[w] = jnp.where(src_alive, depth, 0).astype(jnp.uint8)
        semantic_ref[w] = jnp.where(src_alive, semantic, -1).astype(jnp.int8)
        finder_ref[w:w + 1, :] = jnp.where(
            src_alive & (f_t[w] < _INF), f_arg[w], -1)


@partial(jax.jit, static_argnames=("cfg", "worlds_per_block", "interpret"))
def raycast_pallas(pos, heading, alive, species, cfg: EnvConfig,
                   worlds_per_block: int = 8, interpret: bool = False):
    """Drop-in replacement for env.raycast.raycast (same signature/outputs)."""
    W, A = heading.shape
    S = cfg.sensor_size
    # Largest world-block size <= worlds_per_block that divides W (any W
    # works; W=12 gets wb=6 rather than an assert).
    wb = min(worlds_per_block, W)
    while W % wb != 0:
        wb -= 1

    posx = pos[..., 0]
    posy = pos[..., 1]
    alive_i = alive.astype(jnp.int32)

    offs = jnp.asarray(ray_angle_offsets(cfg)).reshape(1, S)

    # Rank-compact the alive slots (ascending, one-hot scatter over the rank
    # axis — no dynamic-index scatter): compact[w, r] = slot of the r-th
    # alive agent, 0-padded. bf16 operands halve the [W, A, A] mask traffic
    # and stay exact: the one-hot is 0/1, slot ids < 256 are representable,
    # and each sum has at most one nonzero term accumulated in f32.
    from madrona_bots_tpu.env.systems import onehot_mask
    rank = jnp.cumsum(alive_i, axis=1) - 1                       # [W, A]
    rank_oh = onehot_mask(jnp.where(alive, rank, -1), A)         # [W, A, R]
    if A <= 256:  # slot ids exactly representable in bf16
        compact = jnp.einsum(
            "war,a->wr", rank_oh.astype(jnp.bfloat16),
            jnp.arange(A, dtype=jnp.bfloat16),
            preferred_element_type=jnp.float32).astype(jnp.int32)
    else:
        compact = jnp.einsum(
            "war,a->wr", rank_oh.astype(jnp.float32),
            jnp.arange(A, dtype=jnp.float32),
            precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    num_alive = jnp.sum(alive_i, axis=1, keepdims=True)          # [W, 1]

    in_spec = pl.BlockSpec((wb, A), lambda i: (i, 0), memory_space=pltpu.VMEM)
    offs_spec = pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((wb, A), lambda i: (i, 0), memory_space=pltpu.SMEM)
    smem1_spec = pl.BlockSpec((wb, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)
    out3 = pl.BlockSpec((wb, S, A), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out2 = pl.BlockSpec((wb, A), lambda i: (i, 0), memory_space=pltpu.VMEM)

    depth_t, semantic_t, finder = pl.pallas_call(
        partial(_kernel, cfg=cfg, wb=wb),
        grid=(W // wb,),
        in_specs=[in_spec] * 4 + [offs_spec] + [smem_spec] * 4 + [smem1_spec],
        out_specs=(out3, out3, out2),
        out_shape=(
            jax.ShapeDtypeStruct((W, S, A), jnp.uint8),
            jax.ShapeDtypeStruct((W, S, A), jnp.int8),
            jax.ShapeDtypeStruct((W, A), jnp.int32),
        ),
        interpret=interpret,
    )(posx, posy, heading, alive_i, offs,
      posx, posy, species, compact, num_alive)

    # Kernel layout is [W, S, A]; public layout is [W, A, S].
    return (depth_t.transpose(0, 2, 1), semantic_t.transpose(0, 2, 1), finder)
