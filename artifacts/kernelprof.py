"""Section ablation for the systems megakernel: measure each loop's cost by
compiling kernel variants with sections disabled (outputs still written, as
zeros, so I/O stays constant). Scan-amortized per CLAUDE.md.
Usage: python artifacts/kernelprof.py [wb ...]
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
from madrona_bots_tpu.ops import step_pallas

W, A = 8192, 128
K = 32


def main():
    wbs = [int(x) for x in sys.argv[1:]] or [32, 64, 128]
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

    def scan_time(name, wpb):
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
        print(f"{name:28s} {dt*1e3:8.3f} ms/step", flush=True)

    # wb sweep via the module default
    orig = step_pallas.systems_pallas
    for wpb in wbs:
        step_pallas.systems_pallas = partial(orig, worlds_per_block=wpb)
        try:
            scan_time(f"fused wb={wpb}", wpb)
        finally:
            step_pallas.systems_pallas = orig

    # Section ablation: cost of section X ~= t(full) - t(X off). Outputs
    # stay written (zeros), so I/O and launch overhead cancel in the diff.
    # (finder/dmg moved out of the kernel in r5 — XLA-side fused ops.)
    for sec in ("eat", "tallies", "birth", "surr", "respawn"):
        step_pallas.systems_pallas = partial(orig, ablate=frozenset([sec]))
        try:
            scan_time(f"ablate {sec}", 32)
        finally:
            step_pallas.systems_pallas = orig


if __name__ == "__main__":
    main()
