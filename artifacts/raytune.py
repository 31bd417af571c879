"""Tune packed raycast (unroll, pairs_per_block, quad, sort) on the chip.

Usage: python artifacts/raytune.py "4,8,1,1" "4,16,1,0" ...
(each spec = unroll,P[,quad[,sort]]; quad/sort default 0)
RAYTUNE_INIT_AGENTS=128 for the saturated-population regime.
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
    import os
    init_agents = int(os.environ.get("RAYTUNE_INIT_AGENTS", "32"))
    cfg = EnvConfig(num_worlds=W, init_agents=init_agents, max_agents=A)
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

    for spec in sys.argv[1:]:
        if spec.startswith("L"):
            # Ladder kernel: "L,<unroll>[,sort]"
            parts = [int(x) for x in spec.split(",")[1:]]
            u = parts[0] if parts else 4
            sortw = bool(parts[1]) if len(parts) > 1 else True

            @jax.jit
            def blockL(key, pos, heading, alive, species, u=u, sortw=sortw):
                def f(carry, k):
                    pos_b = pos + carry * jnp.float32(1e-30)
                    d, s2, f2 = rp.raycast_pallas_ladder(
                        pos_b, heading, alive, species, cfg,
                        unroll=u, sort_worlds=sortw)
                    return carry + jnp.sum(d.astype(jnp.float32)), ()
                acc, _ = jax.lax.scan(f, jnp.float32(0),
                                      jax.random.split(key, K))
                return acc

            acc = blockL(jax.random.key(1), pos, heading, alive, species)
            jax.device_get(acc)
            t0 = time.perf_counter()
            for i in range(2):
                acc = blockL(jax.random.fold_in(jax.random.key(2), i),
                             pos, heading, alive, species)
            jax.device_get(acc)
            dt = (time.perf_counter() - t0) / 2 / K
            print(f"ladder unroll={u} sort={int(sortw)}: {dt*1e3:8.3f} ms",
                  flush=True)
            continue
        parts = [int(x) for x in spec.split(",")]
        u, p = parts[0], parts[1]
        quad = bool(parts[2]) if len(parts) > 2 else False
        sortw = bool(parts[3]) if len(parts) > 3 else False

        @jax.jit
        def block(key, pos, heading, alive, species,
                  u=u, p=p, quad=quad, sortw=sortw):
            def f(carry, k):
                pos_b = pos + carry * jnp.float32(1e-30)
                d, s2, f2 = rp.raycast_pallas_packed(
                    pos_b, heading, alive, species, cfg,
                    pairs_per_block=p, unroll=u, quad=quad,
                    sort_worlds=sortw)
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
        print(f"unroll={u} P={p} quad={int(quad)} sort={int(sortw)}: "
              f"{dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
