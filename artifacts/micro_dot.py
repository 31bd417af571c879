"""Microbench: one-hot contraction variants on the real TPU.

Measures the [W, A, A] finder-gather/scatter and [W, A, C] chunk-tally
contractions in f32-HIGHEST (current), bf16, and int8 to pick the systems
formulation. device_get-anchored (CLAUDE.md measurement discipline).
"""
import time

import jax
import jax.numpy as jnp

W, A, C = 8192, 128, 48


def timeit(name, f, *args, iters=5):
    g = jax.jit(f)
    jax.device_get(jax.tree.map(lambda x: x.sum(), g(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    jax.device_get(jax.tree.map(lambda x: x.sum(), out))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.3f} ms")
    return dt


def main():
    key = jax.random.key(0)
    finder = jax.random.randint(jax.random.fold_in(key, 0), (W, A), -1, A)
    shot = (jax.random.randint(jax.random.fold_in(key, 1), (W, A), 0, 2))
    vals = jax.random.randint(jax.random.fold_in(key, 2), (W, A), 0, 5)
    cidx = jax.random.randint(jax.random.fold_in(key, 3), (W, A), 0, C)
    cvals = jax.random.randint(jax.random.fold_in(key, 4), (W, C), 0, 100)

    iota_a = jnp.arange(A, dtype=jnp.int32)

    # --- [W,A,A] damage scatter + gather, f32 HIGHEST (current) ---
    def f32_highest(finder, shot, vals):
        oh = (finder[..., None] == iota_a).astype(jnp.float32)
        dmg = jnp.einsum("wat,wa->wt", oh, shot.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
        got = jnp.einsum("wat,wt->wa", oh, vals.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
        return dmg, got

    # --- bf16 operands, f32 accum ---
    def bf16_dot(finder, shot, vals):
        oh = (finder[..., None] == iota_a).astype(jnp.bfloat16)
        dmg = jnp.einsum("wat,wa->wt", oh, shot.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        got = jnp.einsum("wat,wt->wa", oh, vals.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return dmg, got

    # --- int8 operands, int32 accum ---
    def i8_dot(finder, shot, vals):
        oh = (finder[..., None] == iota_a).astype(jnp.int8)
        dmg = jnp.einsum("wat,wa->wt", oh, shot.astype(jnp.int8),
                         preferred_element_type=jnp.int32)
        got = jnp.einsum("wat,wt->wa", oh, vals.astype(jnp.int8),
                         preferred_element_type=jnp.int32)
        return dmg, got

    # --- stacked payloads: one [A,A] x [A,K] matmul per world ---
    def i8_stacked(finder, shot, vals):
        oh = (finder[..., None] == iota_a).astype(jnp.int8)
        pay = jnp.stack([vals, vals + 1], axis=-1).astype(jnp.int8)  # [W,A,2]
        got = jnp.einsum("wat,wtk->wak", oh, pay,
                         preferred_element_type=jnp.int32)
        dmg = jnp.einsum("wat,wa->wt", oh, shot.astype(jnp.int8),
                         preferred_element_type=jnp.int32)
        return dmg, got

    # --- chunk tallies [W,A,C] ---
    def chunk_f32(cidx, cvals):
        oh = (cidx[..., None] == jnp.arange(C)).astype(jnp.float32)
        tally = jnp.einsum("wac,wa->wc", oh, jnp.ones((W, A), jnp.float32),
                          precision=jax.lax.Precision.HIGHEST)
        got = jnp.einsum("wac,wc->wa", oh, cvals.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
        return tally, got

    def chunk_i8(cidx, cvals):
        oh = (cidx[..., None] == jnp.arange(C)).astype(jnp.int8)
        tally = jnp.einsum("wac,wa->wc", oh, jnp.ones((W, A), jnp.int8),
                          preferred_element_type=jnp.int32)
        got = jnp.einsum("wac,wc->wa", oh, cvals.astype(jnp.int8),
                         preferred_element_type=jnp.int32)
        return tally, got

    # correctness cross-check
    d0, g0 = jax.jit(f32_highest)(finder, shot, vals)
    d1, g1 = jax.jit(bf16_dot)(finder, shot, vals)
    d2, g2 = jax.jit(i8_dot)(finder, shot, vals)
    print("bf16 == f32:", bool(jnp.all(d0.astype(jnp.int32) == d1.astype(jnp.int32))),
          bool(jnp.all(g0.astype(jnp.int32) == g1.astype(jnp.int32))))
    print("i8  == f32:", bool(jnp.all(d0.astype(jnp.int32) == d2)),
          bool(jnp.all(g0.astype(jnp.int32) == g2)))

    timeit("finder f32 HIGHEST", f32_highest, finder, shot, vals)
    timeit("finder bf16", bf16_dot, finder, shot, vals)
    timeit("finder int8", i8_dot, finder, shot, vals)
    timeit("finder int8 stacked", i8_stacked, finder, shot, vals)
    timeit("chunk f32 HIGHEST", chunk_f32, cidx, cvals)
    timeit("chunk int8", chunk_i8, cidx, cvals)


if __name__ == "__main__":
    main()
