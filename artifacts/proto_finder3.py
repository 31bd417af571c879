"""Prototype v3: isolate grid overhead vs compute for the finder kernel."""
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

W, A = 8192, 128
i32 = jnp.int32


def col(x, j):
    return x[:, j:j + 1]


def kern_noop(finder_ref, pay_ref, out_ref):
    out_ref[...] = finder_ref[...] + pay_ref[...]


def kern_gather(finder_ref, pay_ref, out_ref):
    wb = finder_ref.shape[0]
    finder = finder_ref[...]
    pay = pay_ref[...]
    g = jnp.zeros((wb, A), i32)
    for t in range(A):
        g = jnp.where(finder == t, col(pay, t), g)
    out_ref[...] = g


def kern_scatter(finder_ref, pay_ref, out_ref):
    wb = finder_ref.shape[0]
    finder = finder_ref[...]
    pay = pay_ref[...]
    lane = jax.lax.broadcasted_iota(i32, (wb, A), 1)
    dmg = jnp.zeros((wb, A), i32)
    for a in range(A):
        dmg = dmg + jnp.where(lane == col(finder, a), col(pay, a), 0)
    out_ref[...] = dmg


def kern_compare_only(finder_ref, pay_ref, out_ref):
    """Same loop count, no lane broadcasts: what do broadcasts cost?"""
    wb = finder_ref.shape[0]
    finder = finder_ref[...]
    pay = pay_ref[...]
    g = jnp.zeros((wb, A), i32)
    for t in range(A):
        g = jnp.where(finder == t, pay + t, g)
    out_ref[...] = g


def make(kernel, wb):
    spec = pl.BlockSpec((wb, A), lambda i: (i, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def f(finder, pay):
        return pl.pallas_call(
            kernel,
            grid=(W // wb,),
            in_specs=[spec] * 2,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((W, A), i32),
        )(finder, pay)
    return f


def timeit(name, f, *args, iters=10):
    jax.device_get(f(*args).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(out.sum())
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms", flush=True)


def main():
    key = jax.random.key(0)
    finder = jax.random.randint(jax.random.fold_in(key, 0), (W, A), -1, A)
    pay = jax.random.randint(jax.random.fold_in(key, 1), (W, A), 0, 34)

    for wb in (8, 32, 128, 256):
        timeit(f"noop wb={wb}", make(kern_noop, wb), finder, pay)
    for wb in (8, 32, 128, 256):
        timeit(f"gather wb={wb}", make(kern_gather, wb), finder, pay)
    for wb in (8, 32):
        timeit(f"compare_only wb={wb}", make(kern_compare_only, wb), finder, pay)
        timeit(f"scatter wb={wb}", make(kern_scatter, wb), finder, pay)


if __name__ == "__main__":
    main()
