import time
import jax
import jax.numpy as jnp
import numpy as np

from madrona_bots_tpu.config import EnvConfig
from madrona_bots_tpu.env.raycast import raycast
from madrona_bots_tpu.ops.raycast_pallas import raycast_pallas

W, A = 8192, 128
cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)
k = jax.random.key(0)
pos = jax.random.uniform(k, (W, A, 2)) * jnp.array([127.0, 95.0])
heading = jax.random.uniform(jax.random.fold_in(k, 1), (W, A)) * 6.28
alive = jax.random.uniform(jax.random.fold_in(k, 2), (W, A)) < 0.9
species = jax.random.randint(jax.random.fold_in(k, 3), (W, A), 1, 5)


def timeit(name, fn, iters=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:24s} {dt*1e3:9.2f} ms  ({W/dt:,.0f} env-steps/s equiv)")
    return out

for wb in (4, 8, 16, 32):
    try:
        timeit(f"pallas wb={wb}", lambda wb=wb: raycast_pallas(
            pos, heading, alive, species, cfg, worlds_per_block=wb))
    except Exception as e:
        print(f"pallas wb={wb} FAILED: {type(e).__name__}: {str(e)[:200]}")

# correctness vs reference on the real TPU (compiled kernel)
d1, s1, f1 = raycast(pos[:64], heading[:64], alive[:64], species[:64],
                     EnvConfig(num_worlds=64, init_agents=32, max_agents=A))
d2, s2, f2 = raycast_pallas(pos[:64], heading[:64], alive[:64], species[:64],
                            EnvConfig(num_worlds=64, init_agents=32, max_agents=A),
                            worlds_per_block=8)
print("finder equal:", bool((np.asarray(f1) == np.asarray(f2)).all()))
print("sem equal frac:", float((np.asarray(s1) == np.asarray(s2)).mean()))
print("depth max diff:", int(np.abs(np.asarray(d1).astype(int) - np.asarray(d2).astype(int)).max()))
