"""learn/pack.py: exact bf16 payload transport for one-hot contractions.

CPU checks of the packing algebra. The TPU-only hazard (XLA eliding
astype-based bf16 round-trips, zeroing the split residuals) is covered on
hardware by artifacts/hw_kernel_parity.py's packer section — these tests
pin the mathematical contract: split3 reconstructs f32 exactly, and a
Packer gather/scatter round-trip through a permutation one-hot is
bit-exact for every kind.
"""

import numpy as np
import jax
import jax.numpy as jnp

from madrona_bots_tpu.learn.pack import (Packer, gather_rows, scatter_rows,
                                         split3)

f32 = jnp.float32


def test_split3_reconstructs_f32_exactly():
    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.standard_normal(1000).astype(np.float32) * 10 ** rng.integers(
            -30, 30, 1000).astype(np.float32),
        np.array([0.0, -0.0, 1.0, -1.0, np.float32(2 ** -120),
                  3.38e38, 1e-30, np.pi], np.float32),
    ])
    h1, h2, h3 = split3(jnp.asarray(x))
    back = (np.asarray(h1, np.float32) + np.asarray(h2, np.float32)
            + np.asarray(h3, np.float32))
    np.testing.assert_array_equal(back, x)


def test_packer_roundtrip_bit_exact():
    rng = np.random.default_rng(1)
    G, K, A = 5, 7, 16
    # permutation one-hot: row k of group g selects source column perm[g, k]
    perm = np.stack([rng.permutation(A)[:K] for _ in range(G)])
    oh = np.zeros((G, K, A), bool)
    for g in range(G):
        oh[g, np.arange(K), perm[g]] = True
    oh = jnp.asarray(oh)

    ints = rng.integers(-127, 256, (G, A)).astype(np.int32)
    floats = (rng.standard_normal((G, A, 3)).astype(np.float32)
              * 10 ** rng.integers(-20, 20, (G, A, 3)).astype(np.float32))
    bools = rng.random((G, A)) > 0.5

    pk = Packer()
    pk.add_int(jnp.asarray(ints))
    pk.add_f32(jnp.asarray(floats))
    pk.add_int(jnp.asarray(bools))
    pk.add_bf16(jnp.asarray(floats[..., 0]))
    out = pk.unpack(gather_rows(oh, pk.payload()))

    sel = lambda x: np.stack([x[g][perm[g]] for g in range(G)])
    np.testing.assert_array_equal(np.asarray(out[0]), sel(ints).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(out[1]), sel(floats))
    np.testing.assert_array_equal(np.asarray(out[2]), sel(bools).astype(np.float32))
    # bf16 kind: value equals cast-first bf16 rounding, exactly
    np.testing.assert_array_equal(
        np.asarray(out[3]),
        np.asarray(jnp.asarray(sel(floats[..., 0])).astype(jnp.bfloat16)
                   .astype(f32)))

    # scatter back: unselected columns are exactly zero, selected exact
    spk = Packer()
    spk.add_f32(out[1])
    back = spk.unpack(scatter_rows(oh, spk.payload()))[0]
    expect = np.zeros((G, A, 3), np.float32)
    for g in range(G):
        expect[g][perm[g]] = np.asarray(out[1])[g]
    np.testing.assert_array_equal(np.asarray(back), expect)


def test_compact_slots_and_taa_roundtrip():
    """compact_slots rank indices + taa_gather/taa_scatter: gathered rows
    are exactly the ascending alive rows (any dtype, bit-exact — pure data
    movement), invalid rows are flagged, overflow is excluded from `keep`,
    and the scatter expansion routes invalid rows away from slot 0."""
    from madrona_bots_tpu.learn.pack import (compact_slots, taa_gather,
                                             taa_scatter)
    rng = np.random.default_rng(2)
    G, Asub, rows, C = 9, 16, 5, 3
    mask = jnp.asarray(rng.random((G, Asub)) > 0.6)
    payload = jnp.asarray(rng.standard_normal((G, Asub, C)).astype(np.float32)
                          * 10 ** rng.integers(-20, 20, (G, Asub, C))
                          .astype(np.float32))

    slot, valid, keep = compact_slots(mask, rows)
    g = taa_gather(payload, slot)

    m = np.asarray(mask)
    for gi in range(G):
        srcs = np.flatnonzero(m[gi])
        n = min(len(srcs), rows)
        # slot/valid agree with the per-group rank compaction
        np.testing.assert_array_equal(np.asarray(slot)[gi, :n], srcs[:n])
        np.testing.assert_array_equal(np.asarray(valid)[gi],
                                      np.arange(rows) < len(srcs))
        np.testing.assert_array_equal(
            np.asarray(g)[gi, :n], np.asarray(payload)[gi, srcs[:n]])
        # keep = alive rows that made the cut
        expect_keep = np.zeros(Asub, bool)
        expect_keep[srcs[:n]] = True
        np.testing.assert_array_equal(np.asarray(keep)[gi], expect_keep)

    back = taa_scatter(g, slot, valid, Asub)
    expect = np.zeros((G, Asub, C), np.float32)
    for gi in range(G):
        srcs = np.flatnonzero(m[gi])[:rows]
        expect[gi, srcs] = np.asarray(g)[gi, :len(srcs)]
    np.testing.assert_array_equal(np.asarray(back), expect)


def test_taa_scatter_empty_group_no_slot0_collision():
    """A group with count=0 must scatter to all-zeros (invalid rows carry
    slot index 0 — the padding-row routing keeps them off real slot 0)."""
    from madrona_bots_tpu.learn.pack import (compact_slots, taa_gather,
                                             taa_scatter)
    mask = jnp.asarray(np.array([[False] * 8, [True] + [False] * 7]))
    payload = jnp.arange(2 * 8 * 2, dtype=jnp.float32).reshape(2, 8, 2) + 1.0
    slot, valid, _ = compact_slots(mask, 3)
    g = taa_gather(payload, slot)
    back = np.asarray(taa_scatter(g, slot, valid, 8))
    assert (back[0] == 0).all()
    np.testing.assert_array_equal(back[1, 0], np.asarray(payload)[1, 0])
    assert (back[1, 1:] == 0).all()
