"""TPU hot-path profiler: per-phase step costs, scan-amortized.

Usage:  python -m madrona_bots_tpu.tools.prof [worlds] [max_agents] [warm]

Measurement discipline (CLAUDE.md): every figure runs K=32 iterations inside
ONE `lax.scan` dispatch carrying the real WorldState (so nothing hoists),
and ends in a `jax.device_get` — through remote-TPU tunnels a single
dispatch absorbs the ~30-40 ms round trip and `block_until_ready` returns at
enqueue time, so per-op single-dispatch timings are fiction (this module's
round-1 version fell for exactly that; see ROADMAP "operational notes").
"""

import sys
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
from madrona_bots_tpu.env import env as env_mod

K = 32


def main():
    from madrona_bots_tpu.env.state import init_state
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    A = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)

    def rand_act(s, k):
        a = jax.random.randint(k, (W, A), 0, NUM_ACTIONS)
        return s.replace(action=jax.nn.one_hot(a, NUM_ACTIONS, dtype=jnp.int32))

    # Warm the population to a steady state on the production path first.
    state = init_state(jax.random.key(0), cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def warmup(state, key):
        def f(s, k):
            return env_mod.sensor_pass(
                env_mod.step_systems(rand_act(s, k), cfg, True), cfg, True), ()
        state, _ = jax.lax.scan(f, state, jax.random.split(key, warm))
        return state, state.alive.sum()

    state, c = warmup(state, jax.random.key(9))
    print(f"after {warm} warm steps: alive {int(jax.device_get(c))}",
          flush=True)

    def scan_steps(name, body, iters=2):
        @partial(jax.jit, donate_argnums=(0,))
        def block(st, key):
            def f(s, k):
                return body(rand_act(s, k), k), ()
            st, _ = jax.lax.scan(f, st, jax.random.split(key, K))
            return st, st.alive.sum()

        st = jax.tree.map(jnp.copy, state)
        st, c = block(st, jax.random.key(2))
        jax.device_get(c)
        t0 = time.perf_counter()
        for i in range(iters):
            st, c = block(st, jax.random.fold_in(jax.random.key(3), i))
        jax.device_get(c)
        dt = (time.perf_counter() - t0) / iters / K
        print(f"{name:34s} {dt*1e3:8.3f} ms/step   ({W/dt:,.0f} env-steps/s)",
              flush=True)

    scan_steps("systems (jnp spec path)",
               lambda s, k: env_mod.step_systems(s, cfg))
    scan_steps("systems (fused Pallas kernel)",
               lambda s, k: env_mod.step_systems(s, cfg, True))
    scan_steps("full step (fused + Pallas sensor)",
               lambda s, k: env_mod.sensor_pass(
                   env_mod.step_systems(s, cfg, True), cfg, True))


if __name__ == "__main__":
    main()
