"""Sweep (worlds_per_block, per-loop stack factors) for the systems
megakernel on hardware. The stack factors trade per-op issue overhead
against roll/concat setup element work, so the optimum depends on wb
(smaller blocks -> more issue-bound -> higher stacks pay).
Usage: python artifacts/stacksweep.py [quick]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.ops import step_pallas

W, A = 8192, 128
K = 32


def main():
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)

    def rand_act(s, k):
        a = jax.random.randint(k, (W, A), 0, NUM_ACTIONS)
        return s.replace(action=jax.nn.one_hot(a, NUM_ACTIONS, dtype=jnp.int32))

    state = init_state(jax.random.key(0), cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def warmup(state, key):
        def f(s, k):
            return env_mod.sensor_pass(
                env_mod.step_systems(rand_act(s, k), cfg, True), cfg, True), ()
        state, _ = jax.lax.scan(f, state, jax.random.split(key, 64))
        return state, state.alive.sum()

    state, c = warmup(state, jax.random.key(9))
    print("alive:", int(jax.device_get(c)), flush=True)
    orig = step_pallas.systems_pallas

    def scan_time(name, wb, stacks):
        step_pallas.systems_pallas = partial(
            orig, worlds_per_block=wb, stacks=stacks)
        try:
            @partial(jax.jit, donate_argnums=(0,))
            def block(st, key):
                def f(s, k):
                    return step_pallas.fused_step_systems(rand_act(s, k), cfg), ()
                st, _ = jax.lax.scan(f, st, jax.random.split(key, K))
                return st, st.alive.sum()

            st = jax.tree.map(jnp.copy, state)
            st, c = block(st, jax.random.key(2))
            jax.device_get(c)
            t0 = time.perf_counter()
            for i in range(2):
                st, c = block(st, jax.random.fold_in(jax.random.key(3), i))
            jax.device_get(c)
            dt = (time.perf_counter() - t0) / 2 / K
            print(f"{name:34s} {dt*1e3:8.3f} ms/step", flush=True)
        finally:
            step_pallas.systems_pallas = orig

    # (dmg, birth, resp, food, tal, surr); CLI combos: "wb:d,b,r,f,t,s"
    ONE = (1, 1, 1, 1, 1, 1)
    if len(sys.argv) > 1:
        combos = []
        for arg in sys.argv[1:]:
            wb, st = arg.split(":")
            combos.append((int(wb), tuple(int(x) for x in st.split(","))))
    else:
        combos = [
            (128, ONE), (64, ONE), (32, ONE),
            (16, (8, 8, 8, 4, 4, 4)),
            (16, (16, 16, 8, 8, 8, 8)),
            (32, (8, 8, 8, 4, 4, 4)),
            (32, (4, 4, 4, 2, 2, 2)),
            (64, (4, 4, 4, 2, 2, 2)),
            (64, (2, 2, 2, 2, 2, 2)),
            (128, (2, 2, 2, 2, 2, 2)),
            (128, (4, 2, 2, 2, 2, 2)),
        ]
    for wb, st in combos:
        scan_time(f"wb={wb} stacks={st}", wb, st)


if __name__ == "__main__":
    main()
