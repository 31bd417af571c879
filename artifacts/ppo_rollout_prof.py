"""Decompose the PPO rollout-phase cost on the real chip.

Times 16-step scans of increasing fidelity to the ppo_iteration rollout:
  env        : env step only, random actions (bench_env core at T=16)
  envpol     : + full-width policy_step forwards (actions from policies)
  envpolrec  : + full Rollout record stacking
  envpolrecg : + GAE + bootstrap policy_step
Every timing ends in jax.device_get. Usage:
  python artifacts/ppo_rollout_prof.py [variant ...]
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
from madrona_bots_tpu.learn.a2c import init_train_states
from madrona_bots_tpu.learn.ppo import Rollout, _flat_obs, make_ppo_optimizer
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator

W, A, T, NS = 8192, 128, 16, 4
f32 = jnp.float32
bf16 = jnp.bfloat16


def main():
    which = sys.argv[1:] or ["env", "envpol", "envpolrec", "envpolrecg"]
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 128, cfg.hidden_state_dim,
                              seed=0)
    models = [ActorCritic.from_generator(gen) for _ in range(NS)]
    opt = make_ppo_optimizer()
    tstates = init_train_states(models, jax.random.key(1), opt)
    params_list = [ts.params for ts in tstates]
    Asub = A // NS

    def policy_full(state, key):
        obs = _flat_obs(state.sensor_depth, state.health, state.pos,
                        state.sensor_semantic, state.surrounding, bf16)
        obs4 = obs.reshape(W, Asub, NS, obs.shape[-1])
        mem4 = state.hidden.reshape(W, Asub, NS, -1)
        alive3 = state.alive.reshape(W, Asub, NS)
        sp3 = state.species.reshape(W, Asub, NS)
        Nc = W * Asub
        a_c, lp_c, v_c, h_c = [], [], [], []
        for s in range(NS):
            pb = jax.tree.map(lambda x: x.astype(bf16), params_list[s])
            lg, v, h = models[s].forward(
                pb, obs4[:, :, s].reshape(Nc, -1),
                mem4[:, :, s].reshape(Nc, -1).astype(bf16))
            lg = lg.astype(f32)
            a = jax.random.categorical(jax.random.fold_in(key, s), lg)
            lsm = jax.nn.log_softmax(lg, -1)
            lp = jnp.sum(lsm * jax.nn.one_hot(a, 6, dtype=lsm.dtype), 1)
            mk = (alive3[:, :, s] & (sp3[:, :, s] == s + 1)).reshape(Nc)
            a_c.append(jnp.where(mk, a, 0).reshape(W, Asub))
            lp_c.append(jnp.where(mk, lp, 0.0).reshape(W, Asub))
            v_c.append(jnp.where(mk, v.astype(f32), 0.0).reshape(W, Asub))
            h_c.append((h.astype(f32) * mk[:, None]).reshape(W, Asub, -1))
        action = jnp.stack(a_c, 2).reshape(W, A)
        logp = jnp.stack(lp_c, 2).reshape(W, A)
        value = jnp.stack(v_c, 2).reshape(W, A)
        hidden = jnp.stack(h_c, 2).reshape(state.hidden.shape)
        return action, logp, value, hidden

    def mk_env():
        @partial(jax.jit, donate_argnums=(0,))
        def block(state, key):
            def body(s, k):
                a = jax.random.randint(k, (W, A), 0, NUM_ACTIONS)
                s = s.replace(action=jax.nn.one_hot(a, NUM_ACTIONS,
                                                    dtype=jnp.int32))
                s = env_mod.sensor_pass(
                    env_mod.step_systems(s, cfg, True), cfg, True)
                return s, ()
            state, _ = jax.lax.scan(body, state, jax.random.split(key, T))
            return state, state.pos.sum()
        return block

    def mk_envpol(record=False, gae=False):
        @partial(jax.jit, donate_argnums=(0,))
        def block(state, key):
            def body(carry, k):
                s = carry
                action, logp, value, hidden = policy_full(s, k)
                rec = None
                if record:
                    rec = Rollout(
                        depth=s.sensor_depth, semantic=s.sensor_semantic,
                        health=s.health, pos=s.pos, surrounding=s.surrounding,
                        memory=s.hidden.reshape(W, A, -1), species=s.species,
                        alive=s.alive, action=action.astype(jnp.int8),
                        logp=logp, value=value, reward=s.reward,
                        next_alive=s.alive)
                oh = jax.nn.one_hot(action, NUM_ACTIONS, dtype=jnp.int32)
                s = s.replace(action=oh * s.alive[..., None], hidden=hidden)
                s = env_mod.sensor_pass(
                    env_mod.step_systems(s, cfg, True), cfg, True)
                return s, (rec if record else ())
            state, roll = jax.lax.scan(body, state, jax.random.split(key, T))
            out = state.pos.sum()
            if gae:
                _, _, last_value, _ = policy_full(
                    state, jax.random.fold_in(key, 999))
                def gae_body(carry, rec):
                    g, nv = carry
                    anext = rec.next_alive & rec.alive
                    nvv = jnp.where(anext, nv, 0.0)
                    delta = rec.reward + 0.99 * nvv - rec.value
                    g = delta + 0.99 * 0.95 * jnp.where(anext, g, 0.0)
                    return (g, rec.value), g
                _, adv = jax.lax.scan(gae_body,
                                      (jnp.zeros((W, A), f32), last_value),
                                      roll, reverse=True)
                out = out + adv.sum()
            elif record:
                out = out + roll.logp.sum()
            return state, out
        return block

    blocks = {"env": mk_env(), "envpol": mk_envpol(),
              "envpolrec": mk_envpol(record=True),
              "envpolrecg": mk_envpol(record=True, gae=True)}
    for name in which:
        block = blocks[name]
        state = init_state(jax.random.key(0), cfg)
        key = jax.random.key(2)
        state, c = block(state, jax.random.fold_in(key, 0))
        jax.device_get(c)
        t0 = time.perf_counter()
        iters = 3
        for i in range(iters):
            state, c = block(state, jax.random.fold_in(key, 1 + i))
        jax.device_get(c)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:12s} {dt * 1e3:8.1f} ms / {T} steps  "
              f"({dt / T * 1e3:6.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
