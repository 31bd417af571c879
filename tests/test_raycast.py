"""Raycast geometry tests + Pallas kernel vs jnp reference equivalence."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_bots_tpu.config import EnvConfig
from madrona_bots_tpu.env.raycast import ray_angle_offsets, raycast


def _single(cfg, pos, heading, alive, species):
    return raycast(jnp.array(pos)[None], jnp.array(heading)[None],
                   jnp.array(alive)[None], jnp.array(species)[None], cfg)


def test_sees_agent_dead_ahead():
    cfg = EnvConfig(num_worlds=1, init_agents=4, max_agents=4)
    pos = np.array([[20.0, 20.0], [30.0, 20.0], [0, 0], [0, 0]], np.float32)
    heading = np.zeros(4, np.float32)
    alive = np.array([True, True, False, False])
    species = np.array([1, 2, 0, 0], np.int32)
    depth, semantic, finder = _single(cfg, pos, heading, alive, species)
    # crosshair of agent 0 is agent 1 (10m dead ahead, facing +x)
    assert int(finder[0, 0]) == 1
    # agent 1 faces +x; its crosshair sees nothing but wall (finder excludes walls)
    assert int(finder[0, 1]) == -1
    # center forward rays of agent 0 carry species 2
    sem = np.asarray(semantic[0, 0])
    nf = cfg.num_forward_rays
    center = sem[nf // 2 - 1: nf // 2 + 1]
    assert (center == 2).any()
    # backward rays of agent 1 see agent 0
    semb = np.asarray(semantic[0, 1])[nf:]
    assert (semb == 1).any()
    # depth of the agent hit is closer (larger byte) than the wall behind it
    d = np.asarray(depth[0, 0])
    agent_px = np.where(sem == 2)[0]
    wall_px = np.where(sem == 0)[0]
    assert d[agent_px].min() > d[wall_px].max() - 5


def test_walls_everywhere_when_alone():
    cfg = EnvConfig(num_worlds=1, init_agents=4, max_agents=4)
    pos = np.array([[64.0, 48.0], [0, 0], [0, 0], [0, 0]], np.float32)
    heading = np.array([0.7, 0, 0, 0], np.float32)
    alive = np.array([True, False, False, False])
    species = np.array([3, 0, 0, 0], np.int32)
    depth, semantic, finder = _single(cfg, pos, heading, alive, species)
    assert (np.asarray(semantic[0, 0]) == 0).all()  # walls only
    assert (np.asarray(depth[0, 0]) > 0).all()
    assert int(finder[0, 0]) == -1


def test_near_clip_excludes_touching_agent():
    cfg = EnvConfig(num_worlds=1, init_agents=4, max_agents=4)
    # target circle edge at distance 0.5 < near=1.1 -> excluded
    pos = np.array([[20.0, 20.0], [21.5, 20.0], [0, 0], [0, 0]], np.float32)
    heading = np.zeros(4, np.float32)
    alive = np.array([True, True, False, False])
    species = np.array([1, 2, 0, 0], np.int32)
    _, semantic, finder = _single(cfg, pos, heading, alive, species)
    assert int(finder[0, 0]) == -1
    assert (np.asarray(semantic[0, 0]) != 2).all()


def test_ray_fan_structure():
    cfg = EnvConfig()
    offs = np.asarray(ray_angle_offsets(cfg))
    assert offs.shape == (32,)
    fov = math.radians(90)
    # forward fan inside +-45deg, backward fan around pi
    assert (np.abs(offs[:24]) < fov / 2).all()
    assert (np.abs(offs[24:] - math.pi) < fov / 2).all()
    # left-to-right sweep
    assert (np.diff(offs[:24]) < 0).all()


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_reference(seed):
    """Pallas kernel (interpret mode on CPU) == jnp reference elementwise."""
    from madrona_bots_tpu.ops.raycast_pallas import raycast_pallas
    cfg = EnvConfig(num_worlds=2, init_agents=16, max_agents=32)
    k = jax.random.key(seed)
    W, A = 2, 32
    pos = jax.random.uniform(k, (W, A, 2)) * jnp.array([127.0, 95.0])
    heading = jax.random.uniform(jax.random.fold_in(k, 1), (W, A)) * 6.28
    alive = jax.random.uniform(jax.random.fold_in(k, 2), (W, A)) < 0.8
    species = jax.random.randint(jax.random.fold_in(k, 3), (W, A), 1, 5)

    d1, s1, f1 = raycast(pos, heading, alive, species, cfg)
    d2, s2, f2 = raycast_pallas(pos, heading, alive, species, cfg,
                                worlds_per_block=2, interpret=True)
    # Exact, not tolerance: the kernel keeps the jnp reference's float
    # arithmetic op-for-op (CLAUDE.md parity invariant). The REAL-hardware
    # counterpart of this assertion is artifacts/hw_kernel_parity.py, which
    # records bit-exactness on TPU in artifacts/HW_KERNEL_PARITY.json.
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_pallas_odd_capacity():
    """Odd max_agents exercises the unroll-2 clamp (visit(b == A) at full
    population) — regression for the SMEM OOB read."""
    import numpy as np
    from madrona_bots_tpu.env.state import init_state
    from madrona_bots_tpu.ops.raycast_pallas import raycast_pallas
    cfg = EnvConfig(num_worlds=4, init_agents=33, max_agents=33, num_species=3)
    s = init_state(jax.random.key(1), cfg)
    assert bool(s.alive.all())  # full population -> odd n_max == A
    d1, m1, f1 = raycast_pallas(s.pos, s.heading, s.alive, s.species, cfg,
                                interpret=True)
    d2, m2, f2 = raycast(s.pos, s.heading, s.alive, s.species, cfg)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


@pytest.mark.parametrize("density", [0.3, 0.45, 0.9])
def test_pallas_packed_modes_match_reference(density):
    """The pair-packed kernel (v3) must equal the jnp reference elementwise
    in BOTH branches: density 0.3 -> every pair fits the half-lane quota
    (mode-2), 0.9 -> none do (mode-1 sweep), 0.45 -> mixed pairs."""
    from madrona_bots_tpu.ops.raycast_pallas import raycast_pallas_packed
    cfg = EnvConfig(num_worlds=6, init_agents=16, max_agents=32)
    k = jax.random.key(int(density * 100))
    W, A = 6, 32
    pos = jax.random.uniform(k, (W, A, 2)) * jnp.array([127.0, 95.0])
    heading = jax.random.uniform(jax.random.fold_in(k, 1), (W, A)) * 6.28
    alive = jax.random.uniform(jax.random.fold_in(k, 2), (W, A)) < density
    species = jax.random.randint(jax.random.fold_in(k, 3), (W, A), 1, 5)
    pops = np.asarray(alive.sum(axis=1)).reshape(-1, 2).max(axis=1)
    if density == 0.3:
        assert (pops <= A // 2).all()
    if density == 0.9:
        assert (pops > A // 2).all()

    d1, s1, f1 = raycast(pos, heading, alive, species, cfg)
    d2, s2, f2 = raycast_pallas_packed(pos, heading, alive, species, cfg,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_pallas_packed_matches_blocked_kernel():
    """v3 == v2 bit-exact on the same inputs (the production-path swap is
    invisible)."""
    from madrona_bots_tpu.ops.raycast_pallas import (raycast_pallas_blocked,
                                                     raycast_pallas_packed)
    cfg = EnvConfig(num_worlds=4, init_agents=8, max_agents=16)
    from madrona_bots_tpu.env.state import init_state
    s = init_state(jax.random.key(3), cfg)
    a = raycast_pallas_packed(s.pos, s.heading, s.alive, s.species, cfg,
                              interpret=True)
    b = raycast_pallas_blocked(s.pos, s.heading, s.alive, s.species, cfg,
                               interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("density", [0.15, 0.4, 0.99])
@pytest.mark.parametrize("sort_worlds", [False, True])
def test_pallas_quad_modes_match_reference(density, sort_worlds):
    """The quad-packed tiles (4 worlds per lane axis) and population-sorted
    world grouping must equal the jnp reference elementwise: density 0.15
    -> quads fit the quarter-lane quota, 0.4 -> pair tiles, 0.99 -> the
    single-sweep fallback; sorting permutes worlds by population and must
    be inverted exactly on output."""
    from madrona_bots_tpu.ops.raycast_pallas import raycast_pallas_packed
    cfg = EnvConfig(num_worlds=8, init_agents=16, max_agents=32)
    k = jax.random.key(int(density * 100) + 7 * sort_worlds)
    W, A = 8, 32
    pos = jax.random.uniform(k, (W, A, 2)) * jnp.array([127.0, 95.0])
    heading = jax.random.uniform(jax.random.fold_in(k, 1), (W, A)) * 6.28
    alive = jax.random.uniform(jax.random.fold_in(k, 2), (W, A)) < density
    species = jax.random.randint(jax.random.fold_in(k, 3), (W, A), 1, 5)
    pops = np.asarray(alive.sum(axis=1))
    if density == 0.15:
        assert (pops.reshape(-1, 4).max(axis=1) <= A // 4).any()

    d1, s1, f1 = raycast(pos, heading, alive, species, cfg)
    d2, s2, f2 = raycast_pallas_packed(pos, heading, alive, species, cfg,
                                       interpret=True, quad=True,
                                       sort_worlds=sort_worlds)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_pallas_sorted_mixed_population():
    """Worlds with wildly different populations: sorting groups them so
    quad/pair/single tiles coexist in one launch; outputs land back in the
    original world order bit-exactly."""
    from madrona_bots_tpu.env.state import init_state
    from madrona_bots_tpu.ops.raycast_pallas import raycast_pallas_packed
    cfg = EnvConfig(num_worlds=8, init_agents=8, max_agents=32)
    s = init_state(jax.random.key(5), cfg)
    k = jax.random.key(11)
    # Hand-mix populations: worlds 0..7 alive counts ~ {4, 31, 7, 18, 30,
    # 5, 26, 12} via per-world thresholds.
    thr = jnp.array([0.12, 0.97, 0.2, 0.55, 0.95, 0.16, 0.8, 0.38])
    alive = jax.random.uniform(k, (8, 32)) < thr[:, None]
    d1, s1, f1 = raycast(s.pos, s.heading, alive, s.species, cfg)
    d2, s2, f2 = raycast_pallas_packed(s.pos, s.heading, alive, s.species,
                                       cfg, interpret=True, quad=True,
                                       sort_worlds=True)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


@pytest.mark.parametrize("density", [0.18, 0.36, 0.6, 0.99])
@pytest.mark.parametrize("sort_worlds", [False, True])
def test_pallas_ladder_modes_match_reference(density, sort_worlds):
    """The quad/triple/pair ladder kernel (v4) must equal the jnp reference
    elementwise in every mode: density 0.18 -> 12-groups go all-quad, 0.36
    -> all-triple, 0.6 -> the pair ladder, 0.99 -> the single-sweep
    fallback; sorting permutes worlds by population within 48-groups and
    must be inverted exactly on output."""
    from madrona_bots_tpu.ops.raycast_pallas import raycast_pallas_ladder
    cfg = EnvConfig(num_worlds=48, init_agents=8, max_agents=24)
    k = jax.random.key(int(density * 100) + 7 * sort_worlds)
    W, A = 48, 24
    pos = jax.random.uniform(k, (W, A, 2)) * jnp.array([127.0, 95.0])
    heading = jax.random.uniform(jax.random.fold_in(k, 1), (W, A)) * 6.28
    alive = jax.random.uniform(jax.random.fold_in(k, 2), (W, A)) < density
    species = jax.random.randint(jax.random.fold_in(k, 3), (W, A), 1, 5)

    d1, s1, f1 = raycast(pos, heading, alive, species, cfg)
    d2, s2, f2 = raycast_pallas_ladder(pos, heading, alive, species, cfg,
                                       interpret=True,
                                       sort_worlds=sort_worlds)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_pallas_ladder_padding_and_mixed_population():
    """World counts that are not a multiple of 48 are zero-padded (and the
    pad worlds must not leak into outputs); mixed per-world populations make
    quad/triple/pair/single tiles coexist in one launch."""
    from madrona_bots_tpu.ops.raycast_pallas import raycast_pallas_ladder
    cfg = EnvConfig(num_worlds=50, init_agents=8, max_agents=24)
    k = jax.random.key(19)
    W, A = 50, 24
    pos = jax.random.uniform(k, (W, A, 2)) * jnp.array([127.0, 95.0])
    heading = jax.random.uniform(jax.random.fold_in(k, 1), (W, A)) * 6.28
    thr = (jnp.arange(W) % 9 + 1) / 9.0
    alive = jax.random.uniform(jax.random.fold_in(k, 2), (W, A)) < thr[:, None]
    species = jax.random.randint(jax.random.fold_in(k, 3), (W, A), 1, 5)

    d1, s1, f1 = raycast(pos, heading, alive, species, cfg)
    d2, s2, f2 = raycast_pallas_ladder(pos, heading, alive, species, cfg,
                                       interpret=True, sort_worlds=True)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_no_fma_contraction_canary():
    """SPEC D7b pin: the sensor's plain-f32 arithmetic must survive the
    compiler. These operands come from a real grazing ray (disc within one
    ulp of 0): XLA:CPU's LLVM backend FMA-contracts an unguarded
    `ca*ocx + sa*ocy`, producing 73.04711 / disc >= 0 (a hit) where the
    individually-rounded form — what TPU hardware computes — gives
    73.047104 / disc < 0 (a miss). If this test ever fails, the _nofma
    guard (env/raycast.py) stopped defeating the contraction on this
    toolchain and the sensor spec is no longer portable."""
    def fb(h):
        return np.frombuffer(bytes.fromhex(h), dtype=np.float32)[0]

    ca, sa = fb("426d7c3f"), fb("f37d2a3e")
    ocx, ocy = fb("d6b88f42"), fb("145f5241")
    r2 = np.float32(1.0)

    from madrona_bots_tpu.env.raycast import _nofma

    def guarded(c, s, x, y):
        cv = jnp.full((8, 128), c)
        sv = jnp.full((8, 128), s)
        t_c = _nofma(cv * x) + _nofma(sv * y)
        oc2 = _nofma(x * x) + _nofma(y * y)
        disc = _nofma(t_c * t_c) + (r2 - oc2)
        return t_c[3, 7], disc[3, 7]

    t_c, disc = jax.jit(guarded)(jnp.float32(ca), jnp.float32(sa),
                                 jnp.float32(ocx), jnp.float32(ocy))
    # plain (individually rounded) reference values
    t_ref = np.float32(np.float32(ca * ocx) + np.float32(sa * ocy))
    oc2 = np.float32(np.float32(ocx * ocx) + np.float32(ocy * ocy))
    d_ref = np.float32(np.float32(t_ref * t_ref) + np.float32(r2 - oc2))
    assert np.asarray(t_c).tobytes() == t_ref.tobytes(), (
        "compiler contracted t_c through the _nofma guard")
    assert np.asarray(disc).tobytes() == d_ref.tobytes()
    assert d_ref < 0, "graze operands no longer graze (test is stale)"
