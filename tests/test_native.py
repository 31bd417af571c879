"""Native host data plane (libmbots_host.so) vs numpy reference."""

import numpy as np
import pytest

from madrona_bots_tpu.utils import native


def _numpy_compaction(alive, species, num_species):
    flat_alive = alive.reshape(-1)
    flat_sp = species.reshape(-1).astype(np.int64)
    flat = np.arange(flat_alive.size)
    key = np.where(flat_alive, flat_sp * flat_alive.size + flat,
                   np.iinfo(np.int64).max)
    order = np.argsort(key, kind="stable")[: int(flat_alive.sum())]
    counts = np.bincount(flat_sp[order], minlength=num_species + 1)[1:]
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return order.astype(np.int32), starts


def test_native_builds():
    assert native.native_available(), "libmbots_host.so failed to build"


def test_compaction_matches_numpy():
    rng = np.random.default_rng(0)
    W, A, NS = 16, 64, 4
    alive = rng.random((W, A)) < 0.7
    species = np.where(alive, rng.integers(1, NS + 1, (W, A)), 0).astype(np.int32)
    perm_n, starts_n = _numpy_compaction(alive, species, NS)
    perm_c, starts_c = native.compaction(alive, species, NS)
    np.testing.assert_array_equal(perm_c, perm_n)
    np.testing.assert_array_equal(starts_c, starts_n)


def test_world_offsets():
    rng = np.random.default_rng(1)
    alive = rng.random((8, 32)) < 0.5
    offsets, counts = native.world_offsets(alive)
    np.testing.assert_array_equal(counts, alive.sum(axis=1))
    np.testing.assert_array_equal(offsets,
                                  np.concatenate([[0], np.cumsum(counts)[:-1]]))


def test_inverse_perm():
    perm = np.array([5, 2, 9, 0], np.int32)
    inv = native.inverse_perm(perm, 12)
    expect = np.full(12, -1, np.int32)
    expect[[5, 2, 9, 0]] = [0, 1, 2, 3]
    np.testing.assert_array_equal(inv, expect)


def test_empty_world():
    alive = np.zeros((4, 8), bool)
    species = np.zeros((4, 8), np.int32)
    perm, starts = native.compaction(alive, species, 4)
    assert perm.size == 0
    np.testing.assert_array_equal(starts, np.zeros(5, np.int32))
