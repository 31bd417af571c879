"""Bisect the ladder raycast regression: kernel (by forced mode) vs epilogue.

Usage: python artifacts/ladderprof.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.ops import raycast_pallas as rp

K = 32
W, A = 8192, 128


def main():
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)
    state = init_state(jax.random.key(0), cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def warm(state, key):
        def f(s, k):
            a = jax.random.randint(k, (W, A), 0, NUM_ACTIONS)
            s = s.replace(action=jax.nn.one_hot(a, NUM_ACTIONS, dtype=jnp.int32))
            return env_mod.sensor_pass(
                env_mod.step_systems(s, cfg, True), cfg, True), ()
        state, _ = jax.lax.scan(f, state, jax.random.split(key, 64))
        return state, state.alive.sum()

    state, c = warm(state, jax.random.key(9))
    jax.device_get(c)
    pos, heading = state.pos, state.heading
    alive, species = state.alive, state.species

    def run(label, **kw):
        @jax.jit
        def block(key, pos, heading, alive, species):
            def f(carry, k):
                pos_b = pos + carry * jnp.float32(1e-30)
                d, s2, f2 = rp.raycast_pallas_ladder(
                    pos_b, heading, alive, species, cfg, **kw)
                return carry + jnp.sum(d.astype(jnp.float32)), ()
            acc, _ = jax.lax.scan(f, jnp.float32(0), jax.random.split(key, K))
            return acc

        acc = block(jax.random.key(1), pos, heading, alive, species)
        jax.device_get(acc)
        t0 = time.perf_counter()
        for i in range(2):
            acc = block(jax.random.fold_in(jax.random.key(2), i),
                        pos, heading, alive, species)
        jax.device_get(acc)
        dt = (time.perf_counter() - t0) / 2 / K
        print(f"{label}: {dt*1e3:8.3f} ms", flush=True)

    run("full sort=1          ", sort_worlds=True)
    run("raw_out sort=1       ", sort_worlds=True, raw_out=True)
    run("raw_out sort=1 m12=0 ", sort_worlds=True, raw_out=True, force_m12=0)
    run("raw_out sort=1 m12=1 ", sort_worlds=True, raw_out=True, force_m12=1)
    run("raw_out sort=1 m12=2 ", sort_worlds=True, raw_out=True, force_m12=2)


if __name__ == "__main__":
    main()
