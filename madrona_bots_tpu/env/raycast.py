"""Lidar raycast sensor + crosshair finder — jnp reference implementation.

Replaces the Madrona raycast RenderingSystem (reference: sensor taskgraph,
src/sim/sim.cpp:1183-1188; per-agent 32-pixel depth+semantic output plus a
"what's in my crosshair" FinderOutput used by shoot/breed, sim.cpp:434-453,
547-569). The Madrona raycaster source is absent from the snapshot, so the
geometry/encoding here is OUR frozen spec (SPEC.md "Sensor pass", deviation D7).

Design: brute force ray-vs-circle over agent slots, structured as a
`lax.fori_loop` over target slots with running min — O(A) memory per (agent,
ray) instead of materializing the [W, A, S, A] pair tensor. The production hot
path is the Pallas kernel in ops/raycast_pallas.py, validated elementwise
against this function (tests/test_raycast.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from madrona_bots_tpu.config import EnvConfig

# python float (not jnp.float32): keeps module import from initializing a
# backend; folds into float32 ops unchanged.
_INF = 3.0e38


def _nofma(x):
    """Pin a product to its own f32 rounding before an add consumes it.

    XLA:CPU's LLVM backend contracts `a*b + c` into fma(a, b, c) — the
    product never rounds to f32 — and ignores optimization_barrier, bitcast
    round-trips, reduce_precision(8, 23) and multi-use interposition. TPU
    (both XLA:TPU and Mosaic) computes the plain individually-rounded form.
    A graze (disc crossing 0 within one ulp) therefore produced DIFFERENT
    sensor bytes per backend. `maximum` is the one interposition LLVM will
    not contract through, and it is the identity for every finite value
    this module produces (|x| <= ~2.6e4 << 3e38), so guarding each product
    makes plain f32 — the TPU-native arithmetic and what the loop oracle
    computes — the portable spec on every backend.
    Pinned by tests/test_raycast.py::test_no_fma_contraction_canary."""
    return jnp.maximum(x, -_INF)


def ray_angle_offsets(cfg: EnvConfig) -> jnp.ndarray:
    """Static per-ray angular offsets from the agent heading.

    3/4 of pixels sweep a 90-degree forward fan left-to-right, 1/4 sweep the
    backward fan (gfx.cpp:252-253; FOV from sim.cpp:221).
    """
    fov = math.radians(cfg.fov_degrees)
    nf, nb = cfg.num_forward_rays, cfg.num_backward_rays
    fwd = [fov / 2 - fov * (i + 0.5) / nf for i in range(nf)]
    bwd = [math.pi + fov / 2 - fov * (j + 0.5) / nb for j in range(nb)]
    return jnp.array(fwd + bwd, dtype=jnp.float32)


def _wall_distance(pos: jax.Array, dirs: jax.Array, cfg: EnvConfig) -> jax.Array:
    """Distance along each ray to the arena boundary (pos strictly inside).

    pos: [..., 2]; dirs: [..., 2] -> [...] f32. The 4 walls are the lines
    x=0, x=lim_x, y=0, y=lim_y (makeWalls, sim.cpp:157-194).
    """
    p, d = pos, dirs
    lim = jnp.array([cfg.world_lim_x, cfg.world_lim_y], dtype=jnp.float32)
    # Positive-direction wall: (lim - p) / d when d > 0; negative: -p / d when d < 0.
    t_hi = jnp.where(d > 0, (lim - p) / jnp.where(d == 0, 1.0, d), _INF)
    t_lo = jnp.where(d < 0, -p / jnp.where(d == 0, 1.0, d), _INF)
    t = jnp.minimum(t_hi, t_lo)  # [..., 2]
    return jnp.minimum(t[..., 0], t[..., 1])


@partial(jax.jit, static_argnames=("cfg",))
def raycast(
    pos: jax.Array,      # [W, A, 2] f32
    heading: jax.Array,  # [W, A] f32
    alive: jax.Array,    # [W, A] bool
    species: jax.Array,  # [W, A] i32
    cfg: EnvConfig,
):
    """Compute (depth u8 [W,A,S], semantic i8 [W,A,S], finder i32 [W,A]).

    Per SPEC.md: rays hit alive agents (circles of radius cfg.agent_radius,
    self excluded) and walls; nearest hit with t > cfg.near wins. Depth byte =
    255 - min(255, floor(255*t/max_range)); semantic = hit species, 0 = wall,
    -1 = none. Finder = nearest agent (walls excluded) along the exact heading
    ray.
    """
    W, A = pos.shape[:2]
    S = cfg.sensor_size
    offsets = ray_angle_offsets(cfg)                      # [S]
    ang = heading[..., None] + offsets[None, None, :]     # [W, A, S]
    dirs = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)    # [W, A, S, 2]
    fdir = jnp.stack([jnp.cos(heading), jnp.sin(heading)], axis=-1)  # [W, A, 2]

    r2 = jnp.float32(cfg.agent_radius * cfg.agent_radius)
    near = jnp.float32(cfg.near)
    self_idx = jnp.arange(A, dtype=jnp.int32)

    def body(b, carry):
        t_min, arg_min, f_min, f_arg = carry
        c = pos[:, b, :]                                   # [W, 2]
        tgt_ok = alive[:, b]                               # [W]
        oc = c[:, None, :] - pos                           # [W, A, 2] target - source
        ocx, ocy = oc[..., 0], oc[..., 1]
        oc2 = _nofma(ocx * ocx) + _nofma(ocy * ocy)        # [W, A]
        ok = tgt_ok[:, None] & (self_idx != b)[None, :]    # [W, A]
        # Same q-folding as the Pallas kernel (ops/raycast_pallas.py): the
        # radius term and exclusion mask collapse into one per-target vector,
        # and disc = t_c^2 + q — arithmetic kept identical between the two
        # implementations so they stay bit-exact against each other.
        q = jnp.where(ok, r2 - oc2, -_INF)                 # [W, A]

        # Sensor rays. Explicit mul+add (NOT an einsum/dot): keeps the
        # arithmetic elementwise f32 on every backend — a dot would hit
        # TPU's default bf16 matmul path and diverge from the Pallas kernel,
        # which computes cos*ocx + sin*ocy on the VPU in f32. Every product
        # rides _nofma so CPU cannot FMA-contract it (plain f32 is the spec).
        t_c = (_nofma(dirs[..., 0] * ocx[:, :, None])
               + _nofma(dirs[..., 1] * ocy[:, :, None]))   # [W, A, S]
        disc = _nofma(t_c * t_c) + q[..., None]            # [W, A, S]
        t_hit = t_c - jnp.sqrt(jnp.maximum(disc, 0.0))
        valid = (disc >= 0) & (t_hit > near)
        t_hit = jnp.where(valid, t_hit, _INF)
        closer = t_hit < t_min
        t_min = jnp.where(closer, t_hit, t_min)
        arg_min = jnp.where(closer, b, arg_min)

        # Finder (crosshair) ray.
        ft_c = _nofma(fdir[..., 0] * ocx) + _nofma(fdir[..., 1] * ocy)
        fdisc = _nofma(ft_c * ft_c) + q
        ft = ft_c - jnp.sqrt(jnp.maximum(fdisc, 0.0))
        fvalid = (fdisc >= 0) & (ft > near)
        ft = jnp.where(fvalid, ft, _INF)
        fcloser = ft < f_min
        f_min = jnp.where(fcloser, ft, f_min)
        f_arg = jnp.where(fcloser, b, f_arg)
        return t_min, arg_min, f_min, f_arg

    t0 = jnp.full((W, A, S), _INF, jnp.float32)
    a0 = jnp.full((W, A, S), -1, jnp.int32)
    ft0 = jnp.full((W, A), _INF, jnp.float32)
    fa0 = jnp.full((W, A), -1, jnp.int32)
    t_agent, arg_agent, f_t, f_arg = jax.lax.fori_loop(0, A, body, (t0, a0, ft0, fa0))

    t_wall = _wall_distance(pos[:, :, None, :], dirs, cfg)  # [W, A, S]
    t_wall = jnp.where(t_wall > near, t_wall, _INF)

    agent_wins = t_agent < t_wall
    t = jnp.minimum(t_agent, t_wall)
    any_hit = t < _INF

    # Gather species of the winning agent per (w, a, s).
    safe_arg = jnp.maximum(arg_agent, 0)
    sp_hit = jnp.take_along_axis(
        species[:, None, :],                   # [W, 1, A]
        safe_arg.reshape(W, 1, A * S), axis=2
    ).reshape(W, A, S)
    semantic = jnp.where(
        any_hit,
        jnp.where(agent_wins, sp_hit, 0),
        -1,
    ).astype(jnp.int8)

    scale = jnp.float32(255.0 / cfg.max_range)
    db = 255 - jnp.minimum(jnp.floor(t * scale), 255.0).astype(jnp.int32)
    depth = jnp.where(any_hit, db, 0).astype(jnp.uint8)

    finder = jnp.where(f_t < _INF, f_arg, -1).astype(jnp.int32)

    # Dead sources produce empty sensors.
    src_alive = alive[..., None]
    depth = jnp.where(src_alive, depth, 0)
    semantic = jnp.where(src_alive, semantic, -1)
    finder = jnp.where(alive, finder, -1)
    return depth, semantic, finder
