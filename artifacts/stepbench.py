"""Scan-amortized step-phase breakdown on the real chip.

Carries the actual WorldState through lax.scan so nothing hoists; each
variant runs K steps per dispatch. Also reports the bench-state population.
Usage: python artifacts/stepbench.py [worlds] [agents] [steps-to-warm]
"""
import sys
sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.state import init_state

K = 32


def scan_steps(name, body, state, key, iters=2):
    @partial(jax.jit, donate_argnums=(0,))
    def block(state, key):
        def f(carry, k):
            return body(carry, k), ()
        state, _ = jax.lax.scan(f, state, jax.random.split(key, K))
        return state, state.alive.sum()

    state2, c = block(state, jax.random.fold_in(key, 0))
    jax.device_get(c)
    t0 = time.perf_counter()
    st = state2
    for i in range(iters):
        st, c = block(st, jax.random.fold_in(key, 1 + i))
    n_alive = int(jax.device_get(c))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt/K*1e3:9.3f} ms/step   (alive {n_alive})",
          flush=True)


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    A = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)

    def rand_act(s, k):
        a = jax.random.randint(k, (W, A), 0, NUM_ACTIONS)
        return s.replace(action=jax.nn.one_hot(a, NUM_ACTIONS, dtype=jnp.int32))

    def mk(section):
        def body(s, k):
            s = rand_act(s, k)
            if section == "sys":
                return env_mod.step_systems(s, cfg)
            if section == "sys_fused":
                return env_mod.step_systems(s, cfg, True)
            if section == "full":
                return env_mod.sensor_pass(env_mod.step_systems(s, cfg), cfg, True)
            if section == "full_fused":
                return env_mod.sensor_pass(
                    env_mod.step_systems(s, cfg, True), cfg, True)
            raise ValueError(section)
        return body

    # Warm the population to the bench steady state first.
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

    key = jax.random.key(1)
    for section in ("sys", "sys_fused", "full", "full_fused"):
        st = jax.tree.map(jnp.copy, state)
        scan_steps(section, mk(section), st, jax.random.fold_in(key, hash(section) % 1000))


if __name__ == "__main__":
    main()
