"""Fused learner-row compaction gather (Pallas TPU).

The A2C tick and PPO rollout compact each (world, class)'s alive agents into
a few learner rows (reference analogue: the species sort that builds dense
per-species batches, /root/reference/src/sim/sim.cpp:1148-1149 +
learn/util.py:14-29). The XLA formulation (learn/pack.py compact_gather)
must first materialize a [W, A, C~170] bf16 payload concat (~365 MB at
8192x128) plus a class-major transpose before the one-hot einsum — ~5 ms of
pure data movement per A2C tick. This kernel fuses the whole thing: each
grid step reads the RAW per-field blocks (bytes stay bytes in HBM), builds
each world's one-hot in VMEM, and runs one tiny MXU matmul per field —
payload bytes cross HBM exactly once.

MEASURED VERDICT (v5e, 8192x128, rows=12): this kernel is ~5-10x SLOWER
than the XLA einsum path it replaces (PPO 212k -> 129k env-steps/s; the
A2C tick regresses similarly). The per-world unrolled jnp.dot([48, 128] x
[128, d]) pays ~0.4 us of MXU issue/pipeline overhead per dot — 7 fields x
8192 worlds = 57k tiny dots ~= 25 ms/step — while XLA lowers the SAME
contraction as ONE batched matmul over 32k groups at ~2.5 ms. The op-floor
lesson from artifacts/gatherbench.py cuts both ways: minimizing op COUNT
matters inside a kernel too, and a single huge batched einsum is the right
tool for this gather. Kept (default OFF, MBOTS_PACK_KERNEL=1 to enable)
as the measured record of why the einsum formulation stands.

Exactness: the one-hot is 0/1 (bf16-exact); every payload field is either
integer-valued <= 255 (sensor bytes, ids) or already in its transport dtype
bf16 (the caller casts first — the same value the uncompacted forward
consumes; f32 scalars ride exact split3 planes built by the caller). Each
output row sums at most one nonzero product, accumulated in f32 — so
outputs are bit-identical to learn/pack.py's compact_gather on the same
columns (tests/test_row_gather.py).

Invalid rows are encoded as slot -1 (matches no lane -> all-zero row), the
same zero-fill compact_gather produces for rows beyond a group's count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

bf16 = jnp.bfloat16
f32 = jnp.float32


def _kernel(slot_ref, *refs, wb: int, nf: int):
    field_refs = refs[:nf]
    out_refs = refs[nf:]
    K = slot_ref.shape[1]
    A = field_refs[0].shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, A), 1)
    for w in range(wb):
        sl = slot_ref[w]                                   # [K, 1] i32
        oh = (jnp.broadcast_to(sl, (K, A)) == lane).astype(bf16)
        for fr, orr in zip(field_refs, out_refs):
            tile = fr[w].astype(bf16)                      # [A, d]
            orr[w] = jnp.dot(oh, tile,
                             preferred_element_type=f32).astype(bf16)


@partial(jax.jit, static_argnames=("interpret", "worlds_per_block"))
def compact_fields(kslot, fields, interpret: bool = False,
                   worlds_per_block: int = 8):
    """Gather learner rows from per-field sources in one fused kernel.

    kslot  : [W, K] i32 — source slot in [0, A) per (world, learner row),
             -1 for invalid rows (they come out zero).
    fields : sequence of [W, A, d] arrays, dtype u8/i8/i32 (integer-valued,
             |v| <= 255) or bf16 (already cast to the transport value).
    Returns [W, K, d] bf16 per field, out[w, k] = field[w, kslot[w, k]].
    """
    W, K = kslot.shape
    A = fields[0].shape[1]
    assert all(f.shape[:2] == (W, A) and f.ndim == 3 for f in fields)

    Kp = -(-K // 8) * 8
    if Kp != K:
        kslot = jnp.concatenate(
            [kslot, jnp.full((W, Kp - K), -1, kslot.dtype)], axis=1)
    wb = worlds_per_block
    while W % wb:
        wb -= 1

    vm = pltpu.VMEM
    slot_spec = pl.BlockSpec((wb, Kp, 1), lambda i: (i, 0, 0),
                             memory_space=vm)
    in_specs = [slot_spec] + [
        pl.BlockSpec((wb, A, f.shape[2]), lambda i: (i, 0, 0),
                     memory_space=vm) for f in fields]
    out_specs = tuple(
        pl.BlockSpec((wb, Kp, f.shape[2]), lambda i: (i, 0, 0),
                     memory_space=vm) for f in fields)
    outs = pl.pallas_call(
        partial(_kernel, wb=wb, nf=len(fields)),
        grid=(W // wb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(
            jax.ShapeDtypeStruct((W, Kp, f.shape[2]), bf16) for f in fields),
        interpret=interpret,
    )(kslot.reshape(W, Kp, 1).astype(jnp.int32), *fields)
    if Kp != K:
        outs = tuple(o[:, :K] for o in outs)
    return list(outs)


def kslot_from_class_slots(slot, valid, W: int, NS: int):
    """[G=NS*W, rows] class-local slots (learn/pack.py compact_slots on
    class-outermost groups g = s*W + w) -> [W, K=NS*rows] GLOBAL slots with
    -1 at invalid rows; k = s*rows + r. Class s occupies global slots
    {i : i % NS == s} (SPEC D2b), so global = local*NS + s."""
    rows = slot.shape[1]
    spec = (jnp.arange(NS, dtype=slot.dtype) * jnp.ones((1,), slot.dtype)
            )[:, None, None]                               # [NS, 1, 1]
    g3 = slot.reshape(NS, W, rows) * NS + spec
    g3 = jnp.where(valid.reshape(NS, W, rows), g3, -1)
    return g3.transpose(1, 0, 2).reshape(W, NS * rows)
