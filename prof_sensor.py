import os, time, functools
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from madrona_bots_tpu.config import EnvConfig
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.ops.raycast_pallas import raycast_pallas

W, A = 8192, 128
cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)
state = env_mod.step(init_state(jax.random.key(0), cfg), cfg, True)
state = jax.block_until_ready(state)

def bench(name, wb, iters=3):
    @jax.jit
    def f(pos, heading, alive, species):
        d, s, fi = raycast_pallas(pos, heading, alive, species, cfg,
                                  worlds_per_block=wb)
        return (d.astype(jnp.uint32).sum() + s.astype(jnp.int32).sum()
                + fi.sum())
    args = (state.pos, state.heading, state.alive, state.species)
    c = f(*args); jax.device_get(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.device_get(f(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:18s} {dt*1e3:10.3f} ms", flush=True)

for wb in (8, 16, 32, 64):
    bench(f"sensor wb={wb}", wb)
