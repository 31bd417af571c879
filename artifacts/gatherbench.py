"""Microbench: per-group row-compaction gather/scatter formulations.

The learner compaction needs, per group g (a world or a (t, world)):
  out[g, r, :] = payload[g, slot[g, r], :]   r < rows   (gather)
  dst[g, slot[g, r], :] = src[g, r, :]                  (scatter)

Candidates:
  eins    : one-hot bf16 einsum gka,gac->gkc (current learn/pack.py)
  taa     : jnp.take_along_axis on axis=1 (sublane axis — NOT the lane
            axis the CLAUDE.md 45x rule forbids; measure it)
  dyn     : take_along_axis with index depth 1 per row via vmap'd
            dynamic_slice  (skipped if slow to build)
  scat_eins / scat_taa: the transposed write-back.

Shapes: G groups, Asub=32 source rows, rows=12 outputs, C payload cols.
Every timing: K reps inside lax.scan, device_get anchored.
Usage: python artifacts/gatherbench.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

f32 = jnp.float32
bf16 = jnp.bfloat16
K = 32


def bench(name, fn, *args):
    @jax.jit
    def block(*a):
        def body(c, _):
            out = fn(*a)
            # fold output into carry so the loop cannot hoist
            return c + out.astype(f32).sum(), ()
        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return tot
    c = block(*args)
    jax.device_get(c)
    t0 = time.perf_counter()
    c = block(*args)
    jax.device_get(c)
    dt = (time.perf_counter() - t0) / K
    print(f"{name:34s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    G, Asub, rows, C = 8192, 32, 12, 152
    key = jax.random.key(0)
    payload = jax.random.normal(key, (G, Asub, C), bf16)
    alive = jax.random.uniform(jax.random.fold_in(key, 1), (G, Asub)) < 0.8
    rank = jnp.cumsum(alive.astype(jnp.int32), axis=1) - 1
    keep = alive & (rank < rows)
    oh = ((rank[:, None, :] == jnp.arange(rows)[None, :, None])
          & keep[:, None, :])
    # slot index per (g, r): argmax over the one-hot (host-side ok)
    slot = jnp.argmax(oh, axis=2).astype(jnp.int32)          # [G, rows]
    src = jax.random.normal(jax.random.fold_in(key, 2), (G, rows, C), bf16)

    def eins(oh, payload):
        return jnp.einsum("gka,gac->gkc", oh.astype(bf16), payload,
                          preferred_element_type=f32)

    def taa(slot, payload):
        return jnp.take_along_axis(payload, slot[:, :, None], axis=1)

    def scat_eins(oh, src):
        return jnp.einsum("gka,gkc->gac", oh.astype(bf16), src,
                          preferred_element_type=f32)

    def scat_put(slot, src):
        dst = jnp.zeros((G, Asub, C), src.dtype)
        return dst.at[jnp.arange(G)[:, None], slot, :].set(src)

    bench("gather einsum bf16 C=152", eins, oh, payload)
    bench("gather take_along_axis C=152", taa, slot, payload)
    bench("scatter einsum C=152", scat_eins, oh, src)
    bench("scatter at[].set C=152", scat_put, slot, src)

    # Small-payload variants (the adv/ret-only gather of the redesign).
    C2 = 8
    p2 = payload[..., :C2]
    s2 = src[..., :C2]
    bench("gather einsum C=8", eins, oh, p2)
    bench("gather take_along_axis C=8", taa, slot, p2)

    # Update-scale single shot: G = 131072 via fold into leading dim.
    GB = 131072
    pb = jax.random.normal(jax.random.fold_in(key, 3), (GB, Asub, C2), bf16)
    slot_b = jnp.tile(slot[:1], (GB, 1))
    bench("gather taa G=131072 C=8", taa, slot_b, pb)

    # f32 payload taa (no packing needed at all)
    bench("gather taa f32 C=152", taa, slot, payload.astype(f32))


if __name__ == "__main__":
    main()
