"""PPO phase decomposition on the real chip (scan-amortized).

Measures, independently: the env+policy rollout step, the policy forward
alone, and one species' minibatch update (loss+grad+Adam) at the production
minibatch shape. Usage: python artifacts/ppoprof.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

from madrona_bots_tpu.config import EnvConfig
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.learn.a2c import init_train_states
from madrona_bots_tpu.learn.ppo import make_ppo_optimizer, _flat_obs
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator

W, A = 8192, 128
bf16 = jnp.bfloat16
f32 = jnp.float32


def timeit(name, block, *args, iters=2):
    out = block(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = block(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:9.1f} ms",
          flush=True)


def main():
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 128, cfg.hidden_state_dim, seed=0)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]
    opt = make_ppo_optimizer()
    tstates = init_train_states(models, jax.random.key(1), opt)

    NS, T, M = 4, 16, 4
    Asub = A // NS
    B = T * W * Asub          # 4.19M rows per species
    mb = B // M

    key = jax.random.key(0)
    obs = jax.random.normal(key, (mb, cfg.obs_dim), bf16)
    mem = jax.random.normal(jax.random.fold_in(key, 1), (mb, 16), f32)
    acts = jax.random.randint(jax.random.fold_in(key, 2), (mb,), 0, 6)
    lp_old = jax.random.normal(jax.random.fold_in(key, 3), (mb,), f32)
    adv = jax.random.normal(jax.random.fold_in(key, 4), (mb,), f32)
    ret = jax.random.normal(jax.random.fold_in(key, 5), (mb,), f32)
    vold = jax.random.normal(jax.random.fold_in(key, 6), (mb,), f32)
    msk = jnp.ones((mb,), bool)

    def one_update(ts, picked, s=0):
        o, m, a, lp, ad, rt, vo, mk = picked

        def loss_fn(params):
            pb = jax.tree.map(lambda x: x.astype(bf16), params)
            logits, v, _ = models[s].forward(pb, o.astype(bf16),
                                             m.astype(bf16))
            logits = logits.astype(f32)
            v = v.astype(f32)
            lsm = jax.nn.log_softmax(logits, -1)
            lpn = jnp.sum(lsm * jax.nn.one_hot(a, 6, dtype=lsm.dtype), 1)
            ratio = jnp.exp(lpn - lp)
            pg = -jnp.minimum(ratio * ad, jnp.clip(ratio, 0.8, 1.2) * ad)
            vl = 0.5 * jnp.maximum((v - rt) ** 2,
                                   (vo + jnp.clip(v - vo, -0.2, 0.2) - rt) ** 2)
            return jnp.mean(pg + 0.5 * vl)

        loss, grads = jax.value_and_grad(loss_fn)(ts.params)
        updates, opt_state = opt.update(grads, ts.opt_state, ts.params)
        from madrona_bots_tpu.learn.a2c import SpeciesTrainState
        return SpeciesTrainState(optax.apply_updates(ts.params, updates),
                                 opt_state), loss

    picked = (obs, mem, acts, lp_old, adv, ret, vold, msk)

    @jax.jit
    def updates_x8(ts):
        def body(ts, _):
            ts, l = one_update(ts, picked)
            return ts, l
        return jax.lax.scan(body, ts, None, length=8)

    timeit("8 minibatch updates (1M rows)", updates_x8, tstates[0])

    @jax.jit
    def fwd_only(params, o, m):
        pb = jax.tree.map(lambda x: x.astype(bf16), params)
        logits, v, h = models[0].forward(pb, o, m.astype(bf16))
        return logits.sum() + v.sum() + h.sum()

    timeit("fwd only (1M rows)", fwd_only, tstates[0].params, obs, mem)

    # Strided pick cost: dynamic_index_in_dim on the [mb, M] reshape.
    big = jax.random.normal(jax.random.fold_in(key, 9), (B, cfg.obs_dim), bf16)

    @jax.jit
    def pick_cost(x, i):
        return jax.lax.dynamic_index_in_dim(
            x.reshape(mb, M, cfg.obs_dim), i, axis=1, keepdims=False).sum()

    timeit("strided pick [4M,69]bf16 -> 1M", pick_cost, big, jnp.int32(1))

    @jax.jit
    def roll_cost(x, o):
        return jnp.roll(x, o, axis=0).sum()

    timeit("row roll [4M,69] bf16", roll_cost, big, jnp.int32(12345))

    # Policy step over the real state (per rollout tick, all 4 species).
    from madrona_bots_tpu.learn import ppo as ppo_mod
    state = init_state(jax.random.key(0), cfg)

    params_list = [ts.params for ts in tstates]

    @jax.jit
    def policy16(state, key):
        obs = _flat_obs(state.sensor_depth, state.health, state.pos,
                        state.sensor_semantic, state.surrounding, bf16)
        D = obs.shape[-1]
        H = state.hidden.shape[-1]
        Nc = W * Asub

        def body(c, k):
            tot = c
            o4 = obs.reshape(W, Asub, NS, D)
            m4 = state.hidden.reshape(W, Asub, NS, H)
            for s in range(NS):
                pb = jax.tree.map(lambda x: x.astype(bf16), params_list[s])
                lg, v, h = models[s].forward(
                    pb, o4[:, :, s].reshape(Nc, D) + tot.astype(bf16),
                    m4[:, :, s].reshape(Nc, H).astype(bf16))
                a = jax.random.categorical(jax.random.fold_in(k, s),
                                           lg.astype(f32))
                tot = tot + a.sum() + v.astype(f32).sum()
            return tot, ()

        tot, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, 16))
        return tot

    timeit("16x policy fwd (4 species)", policy16, state, jax.random.key(3))


if __name__ == "__main__":
    main()
