"""TPU hot-path profiler: per-component step costs with REAL completion sync.

Usage:  python -m madrona_bots_tpu.tools.prof [worlds] [max_agents]

Every timing ends in a jax.device_get of a scalar reduced from ALL outputs —
through remote-TPU tunnels, block_until_ready returns at enqueue time and
under-reports by orders of magnitude (see bench.py). Inputs are passed as jit
arguments (closed-over concrete arrays become XLA constants and get folded at
compile time, timing nothing).
"""

import sys
import time

import jax
import jax.numpy as jnp

from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
from madrona_bots_tpu.env import env as env_mod, systems
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.ops.raycast_pallas import raycast_pallas


def _red(out):
    return sum(jnp.sum(jnp.asarray(x).astype(jnp.float32))
               for x in jax.tree.leaves(out)
               if not jax.dtypes.issubdtype(jnp.asarray(x).dtype,
                                            jax.dtypes.extended))


def bench(name, f, *args, iters=3):
    g = jax.jit(lambda *a: _red(f(*a)))
    jax.device_get(g(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.device_get(g(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:24s} {dt*1e3:10.3f} ms  (incl. one dispatch RTT)", flush=True)


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    A = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)
    state = env_mod.step(init_state(jax.random.key(0), cfg), cfg, True)
    state = jax.block_until_ready(state)
    acts = jax.nn.one_hot(
        jax.random.randint(jax.random.key(9), (W, A), 0, NUM_ACTIONS),
        NUM_ACTIONS, dtype=jnp.int32)
    state = state.replace(action=acts)

    bench("food_spawn", lambda fc, fcell, nf, wk, t: systems.food_spawn(
        fc, fcell, nf, wk, t, cfg), state.food_count, state.food_cell,
        state.num_food, state.world_keys, state.step_count)
    bench("action_system", lambda *a: systems.action_system(*a, cfg),
          state.pos, state.heading, state.alive, state.species, state.action,
          state.finder)
    bench("sensor_pallas", lambda p, h, al, sp: raycast_pallas(p, h, al, sp, cfg),
          state.pos, state.heading, state.alive, state.species)
    bench("step_systems", lambda s: env_mod.step_systems(s, cfg), state)
    bench("step_systems_fused", lambda s: env_mod.step_systems(s, cfg, True),
          state)
    bench("full_step", lambda s: env_mod.sensor_pass(
        env_mod.step_systems(s, cfg), cfg, True), state)
    bench("full_step_fused", lambda s: env_mod.sensor_pass(
        env_mod.step_systems(s, cfg, True), cfg, True), state)


if __name__ == "__main__":
    main()
