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
