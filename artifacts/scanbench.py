"""Scan-amortized microbench harness (CLAUDE.md measurement discipline).

Each op runs K times inside ONE lax.scan dispatch; inputs are perturbed with
the loop carry so the body cannot hoist. Reported per-iteration time has the
~30 ms dispatch RTT amortized away. Usage: python artifacts/scanbench.py
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

W, A = 8192, 128
i32 = jnp.int32
K = 32


def scan_time(name, f, *args, iters=2):
    """f(*args) -> pytree; runs K reps in one scan, carrying a perturbation."""

    @jax.jit
    def block(args):
        def body(carry, _):
            pert, args = carry
            args2 = tuple(
                (a + pert).astype(a.dtype) if jnp.issubdtype(a.dtype, jnp.integer)
                else a for a in args)
            out = f(*args2)
            leaves = [x.sum() for x in jax.tree.leaves(out)]
            npert = (sum(l.astype(i32) if l.dtype != i32 else l
                         for l in leaves) & 1)
            return (npert, args), ()
        (pert, _), _ = jax.lax.scan(body, (jnp.int32(0), args), None, length=K)
        return pert

    jax.device_get(block(args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = block(args)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt/K*1e3:9.3f} ms/iter   ({dt*1e3:7.1f} ms/block)",
          flush=True)


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


def make(kernel, wb):
    spec = pl.BlockSpec((wb, A), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def f(finder, pay):
        return pl.pallas_call(
            kernel,
            grid=(W // wb,),
            in_specs=[spec] * 2,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((W, A), i32),
        )(finder, pay)
    return f


def xla_gather(finder, pay):
    oh = (finder[..., None] == jnp.arange(A)).astype(jnp.float32)
    return jnp.einsum("wat,wt->wa", oh, pay.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST).astype(i32)


def main():
    key = jax.random.key(0)
    finder = jax.random.randint(jax.random.fold_in(key, 0), (W, A), -1, A)
    pay = jax.random.randint(jax.random.fold_in(key, 1), (W, A), 0, 34)

    scan_time("noop wb=32", make(kern_noop, 32), finder, pay)
    scan_time("xla einsum gather", xla_gather, finder, pay)
    for wb in (8, 32, 128):
        scan_time(f"gather wb={wb}", make(kern_gather, wb), finder, pay)
    for wb in (8, 32):
        scan_time(f"scatter wb={wb}", make(kern_scatter, wb), finder, pay)


if __name__ == "__main__":
    main()
