"""Exact bf16 payload packing for one-hot row-compaction einsums.

The learner compaction/expansion contractions (a2c.py, ppo.py) select at
most ONE payload value per output row (the other operand is a 0/1 one-hot),
accumulated in f32 — so the only precision hazard is the operand cast of
the payload itself to bf16 (TPU's default matmul pass truncates f32
operands; CLAUDE.md). Round 2 fixed that by running every f32-payload
einsum at `Precision.HIGHEST`, which is a 6-pass matmul AND one dispatch
per field: ~40 einsums per A2C tick, measurably slower than no compaction
at all.

This module replaces both costs. Every field packs into bf16 payload
COLUMNS that are exact by construction, all fields ride ONE einsum, and
`unpack` re-slices the f32 result:

  - int   : integer-valued, |v| <= 256 — exactly representable in bf16
            (one bf16 column; the 1.0 x v product is exact in f32).
  - bf16  : float the caller wants in bf16 anyway — cast FIRST (one
            column; matches the cast point of the uncompacted path).
  - f32   : full-f32 float — 3-way bf16 split h1 + h2 + h3 == x exactly
            (three columns). bf16 shares f32's exponent range, each
            residual subtraction is exact in f32 (Sterbenz: h is within a
            factor 2 of its remainder), and each residual holds the next
            8 mantissa bits, so 3 x 8 >= 24 covers the f32 significand.
            Post-contraction, the three selected planes re-sum in f32 to
            the original value exactly. (Only f32 values below ~2^-133 —
            sub-bf16-denormal — flush to 0; the HIGHEST-precision matmul
            this replaces flushes the same inputs, as TPU matmuls flush
            denormal operands.)

This is the same decomposition HIGHEST precision performs internally —
but one-sided (the one-hot operand is already bf16-exact), so 3 passes
instead of 6, amortized over every field in the payload in one kernel.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

f32 = jnp.float32
bf16 = jnp.bfloat16


def split3(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Split f32 `x` into three bf16 planes with h1 + h2 + h3 == x exactly
    (for |x| >= ~2^-133 or x == 0; see module docstring).

    The rounding steps MUST use lax.reduce_precision, not astype
    round-trips: XLA's allow-excess-precision pass elides
    convert(convert(x, bf16), f32) on TPU, which silently zeroes the
    residuals (h2 == h3 == 0) — invisible on CPU. Same trap as
    ops/raycast_pallas.py:_bf16_split3."""
    x = x.astype(f32)
    h1 = jax.lax.reduce_precision(x, 8, 7)      # bf16-valued, f32 dtype
    r1 = x - h1
    h2 = jax.lax.reduce_precision(r1, 8, 7)
    h3 = r1 - h2                                # <= 8 significant bits
    return h1.astype(bf16), h2.astype(bf16), h3.astype(bf16)


class Packer:
    """Accumulates fields into one [..., C] bf16 payload.

    add_* calls record fields in order; `payload()` concatenates along the
    last axis; `unpack(out)` slices a contracted f32 [..., C] result back
    into per-field f32 arrays (same order, original trailing shape, f32
    values — callers cast). 2-D fields ([G, A] scalars) round-trip without
    a trailing axis.
    """

    def __init__(self):
        self._cols: List[jax.Array] = []
        self._specs: List[Tuple[str, int, bool]] = []  # kind, width, squeeze

    def _norm(self, x):
        squeeze = x.ndim == 2
        return (x[..., None] if squeeze else x), squeeze

    def add_int(self, x) -> int:
        """Integer-valued field, |v| <= 256 (bool/int/float storage)."""
        xd, sq = self._norm(x)
        self._cols.append(xd.astype(bf16))
        self._specs.append(("int", xd.shape[-1], sq))
        return len(self._specs) - 1

    def add_bf16(self, x) -> int:
        """Float field consumed in bf16 downstream: cast first, transport
        exactly."""
        xd, sq = self._norm(x)
        self._cols.append(xd.astype(bf16))
        self._specs.append(("bf16", xd.shape[-1], sq))
        return len(self._specs) - 1

    def add_f32(self, x) -> int:
        """Full-precision f32 field: 3-way exact split (3 columns)."""
        xd, sq = self._norm(x)
        h1, h2, h3 = split3(xd)
        self._cols.append(jnp.concatenate([h1, h2, h3], axis=-1))
        self._specs.append(("f32", xd.shape[-1], sq))
        return len(self._specs) - 1

    def payload(self) -> jax.Array:
        return jnp.concatenate(self._cols, axis=-1)

    def unpack(self, out: jax.Array) -> List[jax.Array]:
        fields = []
        c = 0
        for kind, w, sq in self._specs:
            if kind == "f32":
                x = (out[..., c:c + w] + out[..., c + w:c + 2 * w]
                     + out[..., c + 2 * w:c + 3 * w])
                c += 3 * w
            else:
                x = out[..., c:c + w]
                c += w
            fields.append(x[..., 0] if sq else x)
        assert c == out.shape[-1], (c, out.shape)
        return fields


def compact_slots(mask: jax.Array, rows: int):
    """Per-group rank compaction indices. mask [G, Asub] bool ->
      slot  [G, rows] i32 : slot index of the r-th set row (ascending), 0
                            where r >= count (mask with `valid`)
      valid [G, rows] bool: r < count(g)
      keep  [G, Asub] bool: set rows with rank < rows (overflow excluded)
    """
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    keep = mask & (rank < rows)
    oh = (jnp.where(mask, rank, -1)[:, None, :]
          == jnp.arange(rows)[None, :, None])            # [G, rows, Asub]
    slot = jnp.argmax(oh, axis=2).astype(jnp.int32)
    valid = (jnp.arange(rows)[None, :]
             < jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True))
    return slot, valid, keep


def taa_gather(payload: jax.Array, slot: jax.Array) -> jax.Array:
    """[G, Asub, C] payload x [G, rows] slot -> [G, rows, C] compaction.

    Pure data movement (exact for every dtype — no matmul transport, so no
    bf16 operand truncation and no need for split3). The gathered axis is
    the SUBLANE axis (C rides the lanes), which TPU lowers efficiently —
    this is not the forbidden lane-axis dynamic gather (CLAUDE.md): a
    [G, Asub] scalar field must ride inside a [G, Asub, C] payload, never
    be gathered as its own trailing-dim-free array.
    Rows with r >= count(g) replicate slot 0's data — mask with `valid`.
    """
    return jnp.take_along_axis(payload, slot[:, :, None], axis=1)


def taa_scatter(src: jax.Array, slot: jax.Array, valid: jax.Array,
                Asub: int) -> jax.Array:
    """[G, rows, C] src -> [G, Asub, C] expansion: dst[g, slot[g, r]] =
    src[g, r] for valid r, zeros elsewhere. Invalid rows are routed to a
    padding row (index Asub) and sliced off, so they can never collide
    with slot 0."""
    G, rows, C = src.shape
    slot_safe = jnp.where(valid, slot, Asub)
    dst = jnp.zeros((G, Asub + 1, C), src.dtype)
    dst = dst.at[jnp.arange(G)[:, None], slot_safe, :].set(src)
    return dst[:, :Asub]


def compact_gather(payload: jax.Array, slot: jax.Array,
                   valid: jax.Array) -> jax.Array:
    """[G, Asub, C] payload x [G, rows] slot -> [G, rows, C] compaction.

    bf16 payloads ride a one-hot einsum — measured 3-4x faster than
    take_along_axis at G~32k on v5e (batched matmul vs serialized gather),
    and exact because every payload column is bf16 by construction.
    Other dtypes fall back to taa_gather (an einsum would truncate f32
    operands to bf16). Einsum rows with r >= count(g) come out ZERO
    (valid-masked one-hot) while taa rows replicate slot 0 — callers mask
    by `valid` either way."""
    if payload.dtype == bf16:
        Asub = payload.shape[1]
        oh = ((slot[:, :, None] == jax.lax.broadcasted_iota(
            slot.dtype, (1, 1, Asub), 2)) & valid[:, :, None])
        return jnp.einsum("gra,gac->grc", oh.astype(bf16), payload,
                          preferred_element_type=f32).astype(bf16)
    return taa_gather(payload, slot)


def expand_scatter(src: jax.Array, slot: jax.Array, valid: jax.Array,
                   Asub: int) -> jax.Array:
    """[G, rows, C] src -> [G, Asub, C] expansion (zeros at un-gathered
    rows). bf16 srcs ride the transposed one-hot einsum (see
    compact_gather — the .at[].set scatter costs ~30 ms at G~32k on v5e);
    other dtypes use the exact taa_scatter. Returns src.dtype."""
    if src.dtype == bf16:
        oh = ((slot[:, :, None] == jax.lax.broadcasted_iota(
            slot.dtype, (1, 1, Asub), 2)) & valid[:, :, None])
        return jnp.einsum("gra,grc->gac", oh.astype(bf16), src,
                          preferred_element_type=f32).astype(bf16)
    return taa_scatter(src, slot, valid, Asub)


def gather_rows(oh: jax.Array, payload: jax.Array) -> jax.Array:
    """[G, K, A] one-hot x [G, A, C] payload -> [G, K, C] f32 (compaction).

    Exact: the one-hot is 0/1 (bf16-exact), each output sums <= 1 nonzero
    product of bf16 operands, accumulated in f32.
    """
    return jnp.einsum("gka,gac->gkc", oh.astype(bf16), payload,
                      preferred_element_type=f32)


def scatter_rows(oh: jax.Array, payload: jax.Array) -> jax.Array:
    """[G, K, A] one-hot x [G, K, C] payload -> [G, A, C] f32 (expansion,
    the transposed contraction; rows not covered by the one-hot get 0)."""
    return jnp.einsum("gka,gkc->gac", oh.astype(bf16), payload,
                      preferred_element_type=f32)
