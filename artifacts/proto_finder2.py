"""Prototype v2: select-accumulate finder kernel variants."""
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


def _kernel_selacc(finder_ref, alive_ref, species_ref, shot_ref,
                   ta_ref, ts_ref, dmg_ref):
    wb = finder_ref.shape[0]
    finder = finder_ref[...]
    pay = alive_ref[...] + 8 * species_ref[...]
    g = jnp.zeros((wb, A), i32)
    for t in range(A):
        g = jnp.where(finder == t, col(pay, t), g)
    ta = g & 7
    ts = g >> 3
    ta_ref[...] = ta
    ts_ref[...] = ts

    shot = shot_ref[...] * (ta > 0)
    lane = jax.lax.broadcasted_iota(i32, (wb, A), 1)
    dmg = jnp.zeros((wb, A), i32)
    for a in range(A):
        m = lane == col(finder, a)
        dmg = dmg + jnp.where(m, col(shot, a), 0)
    dmg_ref[...] = dmg


def _kernel_roll(finder_ref, alive_ref, species_ref, shot_ref,
                 ta_ref, ts_ref, dmg_ref):
    """Rotate-based: roll payload one lane per step; compare finder against
    the rotating source-lane index. Avoids per-lane broadcasts entirely —
    every step is full-vreg roll + compare + select."""
    wb = finder_ref.shape[0]
    finder = finder_ref[...]
    pay = alive_ref[...] + 8 * species_ref[...]
    lane = jax.lax.broadcasted_iota(i32, (wb, A), 1)

    g = jnp.zeros((wb, A), i32)
    rolled = pay
    # After rolling pay by k, lane a holds pay[(a - k) mod A]; select it
    # where finder[a] == (a - k) mod A.
    for k in range(A):
        src = (lane - k) % A if k else lane
        g = jnp.where(finder == src, rolled, g)
        rolled = pltpu.roll(rolled, 1, 1)
    ta = g & 7
    ts = g >> 3
    ta_ref[...] = ta
    ts_ref[...] = ts

    shot = shot_ref[...] * (ta > 0)
    # dmg[t] = sum_a shot[a] * (finder[a] == t): roll (shot, finder)
    # together; at offset k, lane t sees source a = (t - k) mod A.
    dmg = jnp.zeros((wb, A), i32)
    rs, rf = shot, finder
    for k in range(A):
        dmg = dmg + jnp.where(rf == lane, rs, 0)
        rs = pltpu.roll(rs, 1, 1)
        rf = pltpu.roll(rf, 1, 1) + 0  # value semantics
    dmg_ref[...] = dmg


def make(kernel, wb=8):
    spec = pl.BlockSpec((wb, A), lambda i: (i, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def f(finder, alive, species, shot):
        return pl.pallas_call(
            kernel,
            grid=(W // wb,),
            in_specs=[spec] * 4,
            out_specs=(spec,) * 3,
            out_shape=(jax.ShapeDtypeStruct((W, A), i32),) * 3,
        )(finder, alive, species, shot)
    return f


def ref(finder, alive, species, shot):
    oh = (finder[..., None] == jnp.arange(A)).astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    ta = jnp.einsum("wat,wt->wa", oh, alive.astype(jnp.float32),
                    precision=hp).astype(i32)
    ts = jnp.einsum("wat,wt->wa", oh, species.astype(jnp.float32),
                    precision=hp).astype(i32)
    vs = shot * (ta > 0)
    dmg = jnp.einsum("wat,wa->wt", oh, vs.astype(jnp.float32),
                     precision=hp).astype(i32)
    return ta, ts, dmg


def timeit(name, f, *args, iters=5):
    jax.device_get(jax.tree.map(lambda x: x.sum(), f(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jax.tree.map(lambda x: x.sum(), out))
    print(f"{name:28s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms", flush=True)


def main():
    key = jax.random.key(0)
    finder = jax.random.randint(jax.random.fold_in(key, 0), (W, A), -1, A)
    alive = jax.random.randint(jax.random.fold_in(key, 1), (W, A), 0, 2)
    species = jax.random.randint(jax.random.fold_in(key, 2), (W, A), 1, 5)
    shot = jax.random.randint(jax.random.fold_in(key, 3), (W, A), 0, 2)

    ta0, ts0, d0 = jax.jit(ref)(finder, alive, species, shot)
    ok_mask = finder >= 0
    for name, kern in (("selacc", _kernel_selacc), ("roll", _kernel_roll)):
        f = make(kern)
        ta1, ts1, d1 = f(finder, alive, species, shot)
        print(name, "ta ==", bool(jnp.all(ta0 == ta1)),
              "ts ==", bool(jnp.all(jnp.where(ok_mask, ts0, 0) == ts1)),
              "dmg ==", bool(jnp.all(d0 == d1)), flush=True)
        timeit(f"finder {name} wb=8", f, finder, alive, species, shot)


if __name__ == "__main__":
    main()
