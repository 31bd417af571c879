"""Minimal repro probe for the r5 sensor-epilogue crash triage.

Calls ONLY raycast_pallas_ladder at 8192x128 with synthetic typical-pop
inputs (no env step), K=4 scanned reps, device_get anchored.
Usage: python artifacts/epi_repro.py [worlds=8192] [pop_p=0.26]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

from madrona_bots_tpu.config import EnvConfig
from madrona_bots_tpu.ops import raycast_pallas as rp

W = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
P = float(sys.argv[2]) if len(sys.argv) > 2 else 0.26
A = 128
cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)

k = jax.random.key(0)
pos = jax.random.uniform(k, (W, A, 2)) * jnp.array([126.0, 94.0]) + 1.0
heading = jax.random.uniform(jax.random.fold_in(k, 1), (W, A)) * 6.28
alive = jax.random.bernoulli(jax.random.fold_in(k, 2), P, (W, A))
species = jax.random.randint(jax.random.fold_in(k, 3), (W, A), 1, 5)


@jax.jit
def block(key, pos):
    def f(carry, _):
        d, s, fdr = rp.raycast_pallas_ladder(
            pos + carry * 1e-30, heading, alive, species, cfg)
        acc = (d.astype(jnp.float32).sum() + s.astype(jnp.float32).sum()
               + fdr.astype(jnp.float32).sum())
        return carry + acc * 1e-20, ()
    acc, _ = jax.lax.scan(f, jnp.float32(0), None, length=4)
    return acc


t0 = time.time()
print("sum:", float(jax.device_get(block(jax.random.key(1), pos))),
      f"({time.time()-t0:.1f}s)", flush=True)
t0 = time.time()
print("sum2:", float(jax.device_get(block(jax.random.key(2), pos))))
dt = (time.time() - t0) / 4
print(f"steady: {dt*1e3:.3f} ms/call", flush=True)
print("OK", flush=True)
