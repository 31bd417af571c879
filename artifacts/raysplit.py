"""Decompose the packed sensor pass: preprocessing / kernel / expansion.

Scan-amortized on bench-shaped state (device_get-anchored).
Usage: python artifacts/raysplit.py [worlds]
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


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    A = 128
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)
    S = cfg.sensor_size
    half = A // 2

    # Warm to steady state with the production path.
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

    def prep(pos, heading, alive, species):
        posx = pos[..., 0]; posy = pos[..., 1]
        alive_i = alive.astype(jnp.int32)
        rank = jnp.cumsum(alive_i, axis=1) - 1
        roh = (jnp.where(alive, rank, -1)[:, :, None]
               == jnp.arange(half)[None, None, :]).astype(jnp.bfloat16)
        lane_ids = jnp.broadcast_to(
            jnp.arange(A, dtype=jnp.float32)[None, :], (W, A))
        cols = (*rp._bf16_split3(posx), *rp._bf16_split3(posy),
                *rp._bf16_split3(heading),
                lane_ids.astype(jnp.bfloat16), species.astype(jnp.bfloat16))
        payload = jnp.stack(cols, axis=-1)
        pk = jnp.einsum("war,waf->wrf", roh, payload,
                        preferred_element_type=jnp.float32)
        return roh, pk

    def expand_only(roh, depth_t, semantic_t, finder_t):
        payl = jnp.concatenate([
            depth_t[:, :, :half].transpose(0, 2, 1).astype(jnp.bfloat16),
            semantic_t[:, :, :half].transpose(0, 2, 1).astype(jnp.bfloat16),
            finder_t[:, :half, None].astype(jnp.bfloat16),
        ], axis=-1)
        exp = jnp.einsum("war,wrf->waf", roh, payl,
                         preferred_element_type=jnp.float32)
        return exp

    def bench(name, fn, ins, iters=2):
        @jax.jit
        def block(key, *ins):
            def f(carry, k):
                # Perturb float inputs with the carry so the body cannot
                # hoist as loop-invariant (memory rule 2).
                def pert(x):
                    if jnp.issubdtype(x.dtype, jnp.floating):
                        return (x.astype(jnp.float32)
                                + carry * jnp.float32(1e-30)).astype(x.dtype)
                    return x
                ins_b = [pert(x) for x in ins]
                out = fn(*ins_b)
                s = sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out))
                return carry + s, ()
            acc, _ = jax.lax.scan(f, jnp.float32(0), jax.random.split(key, K))
            return acc

        acc = block(jax.random.key(1), *ins)
        jax.device_get(acc)
        t0 = time.perf_counter()
        for i in range(iters):
            acc = block(jax.random.fold_in(jax.random.key(2), i), *ins)
        jax.device_get(acc)
        dt = (time.perf_counter() - t0) / iters / K
        print(f"{name:28s} {dt*1e3:8.3f} ms", flush=True)

    # NOTE: fn(*ins) is loop-invariant; XLA may hoist it out of the scan.
    # Guard: compare against the full-pass number, which uses evolving state.
    bench("prep(mask+pack einsum)", prep, (pos, heading, alive, species))

    roh, pk = jax.jit(prep)(pos, heading, alive, species)
    d, s2, f2 = jax.jit(partial(rp.raycast_pallas_packed, cfg=cfg))(
        pos, heading, alive, species)
    # raw kernel outputs for expansion timing: reconstruct from the public
    # call (close enough in shape: [W, A, S] -> [W, S, A])
    bench("expand einsum", expand_only,
          (roh, d.transpose(0, 2, 1), s2.transpose(0, 2, 1), f2))
    bench("full packed raycast",
          lambda p, h, a, sp: rp.raycast_pallas_packed(p, h, a, sp, cfg),
          (pos, heading, alive, species))
    bench("v2 blocked raycast",
          lambda p, h, a, sp: rp.raycast_pallas_blocked(p, h, a, sp, cfg),
          (pos, heading, alive, species))


if __name__ == "__main__":
    main()
