"""ops/row_gather.py — fused learner-row compaction vs learn/pack.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

from madrona_bots_tpu.learn.pack import compact_gather, compact_slots
from madrona_bots_tpu.ops.row_gather import (compact_fields,
                                             kslot_from_class_slots)

bf16 = jnp.bfloat16


@pytest.mark.parametrize("density", [0.2, 0.7])
def test_compact_fields_matches_compact_gather(density):
    """The fused kernel must equal the einsum path bit-for-bit on every
    field kind: sensor bytes (u8/i8), bf16 floats, small ints."""
    k = jax.random.key(int(density * 10))
    W, A, NS, rows = 16, 32, 4, 6
    Asub = A // NS
    G = NS * W
    mask = jax.random.uniform(k, (G, Asub)) < density
    slot, valid, _ = compact_slots(mask, rows)

    depth = jax.random.randint(jax.random.fold_in(k, 1), (W, A, 8), 0, 256
                               ).astype(jnp.uint8)
    sem = jax.random.randint(jax.random.fold_in(k, 2), (W, A, 8), -1, 5
                             ).astype(jnp.int8)
    flt = jax.random.normal(jax.random.fold_in(k, 3), (W, A, 5)
                            ).astype(bf16)
    ints = jax.random.randint(jax.random.fold_in(k, 4), (W, A, 3), 0, 200)

    kslot = kslot_from_class_slots(slot, valid, W, NS)
    outs = compact_fields(kslot, [depth, sem, flt, ints], interpret=True)

    # Reference: class-outermost einsum gather on the same columns. The
    # class-major payload view of global slots {i : i % NS == s} is the
    # strided reshape below.
    def cm(x):
        x4 = x.reshape(W, Asub, NS, x.shape[-1])
        return x4.transpose(2, 0, 1, 3).reshape(G, Asub, x.shape[-1])

    for src, got in zip((depth, sem, flt, ints), outs):
        ref = compact_gather(cm(src.astype(bf16)), slot, valid)
        ref4 = ref.reshape(NS, W, rows, src.shape[-1]).transpose(1, 0, 2, 3)
        np.testing.assert_array_equal(
            np.asarray(ref4.reshape(W, NS * rows, -1), dtype=np.float32),
            np.asarray(got, dtype=np.float32))


def test_compact_fields_row_padding():
    """K not a multiple of 8 exercises the pad-to-8 path; invalid rows are
    zero."""
    k = jax.random.key(9)
    W, A, K = 8, 16, 5
    kslot = jax.random.randint(k, (W, K), -1, A)
    x = jax.random.normal(jax.random.fold_in(k, 1), (W, A, 4)).astype(bf16)
    (out,) = compact_fields(kslot, [x], interpret=True)
    ref = jnp.where((kslot >= 0)[..., None],
                    jnp.take_along_axis(
                        x, jnp.maximum(kslot, 0)[..., None], axis=1),
                    0).astype(bf16)
    np.testing.assert_array_equal(np.asarray(out, dtype=np.float32),
                                  np.asarray(ref, dtype=np.float32))
