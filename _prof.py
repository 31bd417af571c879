import time
from functools import partial

import jax
import jax.numpy as jnp

from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.raycast import raycast
from madrona_bots_tpu.env.state import init_state

W, A = 8192, 128
cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)


def timeit(name, fn, *args, iters=20, donate_state=False):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.2f} ms  ({W/dt:,.0f} env-steps/s)")
    return out


# dispatch overhead
x = jnp.zeros((8, 128))
f_triv = jax.jit(lambda x: x + 1)
timeit("trivial dispatch", f_triv, x, iters=100)

state = init_state(jax.random.key(0), cfg)
acts = jax.nn.one_hot(
    jax.random.randint(jax.random.key(1), (W, A), 0, NUM_ACTIONS),
    NUM_ACTIONS, dtype=jnp.int32)
state = state.replace(action=acts)

f_sys = jax.jit(lambda s: env_mod.step_systems(s, cfg))
state2 = timeit("step_systems only", f_sys, state, iters=10)

f_ray = jax.jit(lambda s: raycast(s.pos, s.heading, s.alive, s.species, cfg))
timeit("raycast only", f_ray, state2, iters=10)

f_step = jax.jit(lambda s: env_mod.sensor_pass(env_mod.step_systems(s, cfg), cfg))
timeit("full step (no donate)", f_step, state, iters=10)
