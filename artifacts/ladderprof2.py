"""Time the ladder prologue pieces (pad/sort/compaction/tiles) vs the kernel."""
import sys, time
sys.path.insert(0, "/root/repo")
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.ops.raycast_pallas import _bf16_split3
from madrona_bots_tpu.env.raycast import ray_angle_offsets

K = 32
W0, A = 8192, 128


def main():
    cfg = EnvConfig(num_worlds=W0, init_agents=32, max_agents=A)
    state = init_state(jax.random.key(0), cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def warm(state, key):
        def f(s, k):
            a = jax.random.randint(k, (W0, A), 0, NUM_ACTIONS)
            s = s.replace(action=jax.nn.one_hot(a, NUM_ACTIONS, dtype=jnp.int32))
            return env_mod.sensor_pass(
                env_mod.step_systems(s, cfg, True), cfg, True), ()
        state, _ = jax.lax.scan(f, state, jax.random.split(key, 64))
        return state, state.alive.sum()

    state, c = warm(state, jax.random.key(9))
    jax.device_get(c)
    pos0, heading0 = state.pos, state.heading
    alive0, species0 = state.alive, state.species

    S = cfg.sensor_size
    half, quarter = A // 2, A // 4
    tb1, tb2 = A // 3, 2 * (A // 3)
    tw = (tb1, tb2 - tb1, A - tb2)
    GRP = 48
    W = -(-W0 // GRP) * GRP

    def prologue(pos, heading, alive, species, do_sort=True, do_tiles=True):
        padw = W - W0
        pad0 = lambda x: jnp.concatenate(
            [x, jnp.zeros((padw,) + x.shape[1:], x.dtype)], axis=0)
        pos, heading, alive, species = map(pad0, (pos, heading, alive, species))
        if do_sort:
            G = W // GRP
            pops = jnp.sum(alive.astype(jnp.int32), axis=1).reshape(G, GRP)
            perm = jnp.argsort(pops, axis=1)

            def _psort(x, idx):
                xg = x.reshape((G, GRP) + x.shape[1:])
                ix = idx.reshape(idx.shape + (1,) * (xg.ndim - 2))
                return jnp.take_along_axis(xg, ix, axis=1).reshape(x.shape)

            pos = _psort(pos, perm)
            heading = _psort(heading, perm)
            alive = _psort(alive, perm)
            species = _psort(species, perm)
        posx, posy = pos[..., 0], pos[..., 1]
        alive_i = alive.astype(jnp.int32)
        rank = jnp.cumsum(alive_i, axis=1) - 1
        roh = (jnp.where(alive, rank, -1)[:, :, None]
               == jnp.arange(half)[None, None, :]).astype(jnp.bfloat16)
        lane_ids = jnp.broadcast_to(
            jnp.arange(A, dtype=jnp.float32)[None, :], (W, A))
        cols = (*_bf16_split3(posx), *_bf16_split3(posy),
                *_bf16_split3(heading), lane_ids.astype(jnp.bfloat16),
                species.astype(jnp.bfloat16))
        payload = jnp.stack(cols, axis=-1)
        pk = jnp.einsum("war,waf->wrf", roh, payload,
                        preferred_element_type=jnp.float32)
        cx = pk[..., 0] + pk[..., 1] + pk[..., 2]
        cy = pk[..., 3] + pk[..., 4] + pk[..., 5]
        ch = pk[..., 6] + pk[..., 7] + pk[..., 8]
        cslot = pk[..., 9].astype(jnp.int32)
        acc = cx.sum() + cy.sum() + ch.sum() + cslot.sum()
        if do_tiles:
            for v in (cx, cy, ch, cslot):
                if do_tiles in (True, "pair"):
                    acc += v.reshape(W // 4, 2, A).sum()
                if do_tiles in (True, "quad"):
                    acc += v[:, :quarter].reshape(W // 8, 2, A).sum()
                if do_tiles in (True, "tri"):
                    acc += jnp.concatenate([v[0::3, :tw[0]], v[1::3, :tw[1]],
                                            v[2::3, :tw[2]]], axis=1).sum()
        return acc.astype(jnp.float32)

    def run(label, fn):
        @jax.jit
        def block(key, pos, heading, alive, species):
            def f(carry, k):
                pos_b = pos + carry * jnp.float32(1e-30)
                return carry + fn(pos_b, heading, alive, species), ()
            acc, _ = jax.lax.scan(f, jnp.float32(0), jax.random.split(key, K))
            return acc

        acc = block(jax.random.key(1), pos0, heading0, alive0, species0)
        jax.device_get(acc)
        t0 = time.perf_counter()
        for i in range(2):
            acc = block(jax.random.fold_in(jax.random.key(2), i),
                        pos0, heading0, alive0, species0)
        jax.device_get(acc)
        dt = (time.perf_counter() - t0) / 2 / K
        print(f"{label}: {dt*1e3:8.3f} ms", flush=True)

    run("prologue pair-tiles only", lambda *a: prologue(*a, True, "pair"))
    run("prologue quad-tiles only", lambda *a: prologue(*a, True, "quad"))
    run("prologue tri-tiles  only", lambda *a: prologue(*a, True, "tri"))


if __name__ == "__main__":
    main()
