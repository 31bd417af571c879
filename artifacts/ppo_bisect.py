"""Bisect the PPO iteration cost on the real chip.

Times the production ppo_iteration (slots=12, 2 epochs x 4 minibatches)
against reduced variants to attribute time to rollout vs compaction vs
minibatch updates. Every timing ends in jax.device_get (tunnel discipline).

Usage: python artifacts/ppo_bisect.py [variant ...]
  variants: prod, e1m1, nocompact  (default: all)
Stage attribution: MBOTS_PPO_STAGE=rollout|buffers truncates the
iteration after that stage (learn/ppo.py knob).
"""
import sys
sys.path.insert(0, "/root/repo")
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from madrona_bots_tpu.config import EnvConfig
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.learn.a2c import init_train_states
from madrona_bots_tpu.learn.ppo import make_ppo_trainer
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator

W, A, T = 8192, 128, 16


def timed(name, cfg, models, kwargs, iters=2):
    it, opt = make_ppo_trainer(models, cfg, rollout_len=T, use_pallas=True,
                               compute_dtype=jnp.bfloat16, **kwargs)
    tstates = init_train_states(models, jax.random.key(1), opt)
    state = init_state(jax.random.key(0), cfg)
    key = jax.random.key(2)
    state, tstates, m = it(state, tstates, jax.random.fold_in(key, 0))
    jax.device_get(m["env_steps"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, tstates, m = it(state, tstates, jax.random.fold_in(key, 1 + i))
    jax.device_get(m["env_steps"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1e3:8.1f} ms/iter  "
          f"{W * T / dt:9.0f} env-steps/s", flush=True)
    return dt


def main():
    which = sys.argv[1:] or ["prod", "e1m1", "nocompact", "norollcompact"]
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 128, cfg.hidden_state_dim,
                              seed=0)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]
    variants = {
        # production config (bench.py BENCH_MODE=ppo)
        "prod": dict(learner_slots_per_class=12),
        # 1 epoch x 1 minibatch: update cost scaled 8x down
        "e1m1": dict(learner_slots_per_class=12, update_epochs=1,
                     num_minibatches=1),
        # no learner-row compaction anywhere
        "nocompact": dict(learner_slots_per_class=None),
    }
    for name in which:
        timed(name, cfg, models, variants[name])


if __name__ == "__main__":
    main()
