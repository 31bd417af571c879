"""Decompose the fused A2C tick cost on the real chip.

Times scans of increasing fidelity to make_train_tick at production shapes
(8192w x 128 slots, bf16, slots=12):
  env     : env step only
  obs     : + both construct_obs builds
  pack    : + payload concat + class-major transpose + compact_slots
            + taa_gather + batched write-back scatter (no learning)
  tick    : the real make_train_tick (full)
Every timing ends in jax.device_get. Usage:
  python artifacts/a2cprof.py [variant ...]
"""
import sys
sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from madrona_bots_tpu.config import NUM_ACTIONS, EnvConfig
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.learn.a2c import init_train_states, make_train_tick
from madrona_bots_tpu.learn.obs import construct_obs
from madrona_bots_tpu.learn.pack import (compact_slots, split3, taa_gather,
                                         taa_scatter)
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator

W, A, NS, K = 8192, 128, 4, 16
rows = 12
f32 = jnp.float32
bf16 = jnp.bfloat16


def main():
    which = sys.argv[1:] or ["env", "obs", "pack", "tick"]
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)
    Asub = A // NS
    H = cfg.hidden_state_dim

    def envstep(s, k):
        a = jax.random.randint(k, (W, A), 0, NUM_ACTIONS)
        s = s.replace(action=jax.nn.one_hot(a, NUM_ACTIONS, dtype=jnp.int32))
        return env_mod.sensor_pass(env_mod.step_systems(s, cfg, True),
                                   cfg, True)

    def pack_block(s, level):
        """level: 0=obs only, 1=+payload concat+transpose, 2=+compact_slots,
        3=+gather, 4=+scatter (full), 13/14=einsum gather/scatter arms."""
        obs_cur = construct_obs(s, cfg, prev=False, dtype=bf16)
        obs_prev = construct_obs(s, cfg, prev=True, dtype=bf16)
        out = obs_cur.astype(f32).sum() + obs_prev.astype(f32).sum()
        if level < 1:
            return out
        G = NS * W

        def cm(x):
            x4 = x.reshape((W, Asub, NS) + x.shape[2:])
            perm = (2, 0, 1) + tuple(range(3, x4.ndim))
            return x4.transpose(perm).reshape((G, Asub) + x.shape[2:])

        spec_tile = jnp.tile(jnp.arange(1, NS + 1,
                                        dtype=s.species.dtype), Asub)
        m_full = s.alive & (s.species == spec_tile[None, :])
        lm_full = m_full & (s.prev_species == spec_tile[None, :])
        cols = [obs_cur, obs_prev,
                s.hidden.reshape(W, A, H).astype(bf16),
                s.prev_hidden.reshape(W, A, H).astype(bf16),
                lm_full[..., None].astype(bf16),
                jnp.argmax(s.action, axis=-1)[..., None].astype(bf16)]
        cols += [p[..., None] for p in split3(s.reward)]
        payload = cm(jnp.concatenate(cols, axis=-1))
        if level < 2:
            return out + payload.astype(f32).sum()
        m = cm(m_full)
        slot, valid_g, keep = compact_slots(m, rows)
        if level < 3:
            return (out + payload.astype(f32).sum() + slot.sum()
                    + valid_g.sum() + keep.sum())
        oh = ((slot[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, Asub), 2)) & valid_g[:, :, None])
        if level in (13, 14):
            grec = jnp.einsum("gra,gac->grc", oh.astype(bf16), payload,
                              preferred_element_type=f32).astype(bf16)
        else:
            grec = taa_gather(payload, slot)
        if level == 13 or level < 4:
            return out + grec.astype(f32).sum()
        src = grec[..., :NUM_ACTIONS + H]
        if level == 14:
            back = jnp.einsum("gra,grc->gac", oh.astype(bf16),
                              src.astype(bf16), preferred_element_type=f32)
        else:
            back = taa_scatter(src.astype(f32), slot, valid_g, Asub)
        return out + grec.astype(f32).sum() + back.astype(f32).sum()

    def mk(obsp, level=0):
        @partial(jax.jit, donate_argnums=(0,))
        def block(s, key):
            def body(c, k):
                s, acc = c
                s = envstep(s, k)
                if obsp:
                    acc = acc + pack_block(s, level)
                return (s, acc), ()
            (s, acc), _ = jax.lax.scan(body, (s, jnp.float32(0)),
                                       jax.random.split(key, K))
            return s, acc + s.pos.sum()
        return block

    blocks = {"env": mk(False), "obs": mk(True, 0),
              "payload": mk(True, 1), "slots": mk(True, 2),
              "gather": mk(True, 3), "pack": mk(True, 4),
              "gather_eins": mk(True, 13), "pack_eins": mk(True, 14)}

    for name in which:
        if name == "tick":
            gen = SpeciesNetGenerator(cfg.obs_dim, 6, 128,
                                      cfg.hidden_state_dim, seed=0)
            models = [ActorCritic.from_generator(gen) for _ in range(NS)]
            tick, opt = make_train_tick(models, cfg, use_pallas=True,
                                        compute_dtype=bf16,
                                        learner_slots_per_class=rows)
            ts = init_train_states(models, jax.random.key(1), opt)

            @partial(jax.jit, donate_argnums=(0, 1))
            def tickblock(s, ts, key):
                def body(c, k):
                    s, ts = c
                    s, ts, m = tick(s, ts, k)
                    return (s, ts), ()
                (s, ts), _ = jax.lax.scan(body, (s, ts),
                                          jax.random.split(key, K))
                return s, ts, s.pos.sum()

            s = init_state(jax.random.key(0), cfg)
            s, ts, c = tickblock(s, ts, jax.random.key(2))
            jax.device_get(c)
            t0 = time.perf_counter()
            s, ts, c = tickblock(s, ts, jax.random.key(3))
            jax.device_get(c)
            dt = (time.perf_counter() - t0) / K
        else:
            block = blocks[name]
            s = init_state(jax.random.key(0), cfg)
            s, c = block(s, jax.random.key(2))
            jax.device_get(c)
            t0 = time.perf_counter()
            s, c = block(s, jax.random.key(3))
            jax.device_get(c)
            dt = (time.perf_counter() - t0) / K
        print(f"{name:8s} {dt * 1e3:8.2f} ms/step  "
              f"{W / dt:9.0f} env-steps/s", flush=True)


if __name__ == "__main__":
    main()
