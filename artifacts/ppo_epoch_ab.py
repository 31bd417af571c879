"""PPO update-schedule A/B: 2 epochs x 4 minibatches (production default)
vs 1 epoch x 8 minibatches (ROADMAP r5 item 4).

Both schedules take 8 Adam steps per iteration over the same rollout data;
2x4 passes the data twice (two full forward+backward sweeps), 1x8 once —
so 1x8 halves the update phase's activation traffic, which BASELINE.md
attributes ~200 ms/iter to. The question is whether one data pass learns
as well; this runs both arms seed-matched and records the learning series
plus measured env-steps/s.

Usage: python artifacts/ppo_epoch_ab.py [seeds=2] [iters=1000] [worlds=2048]
Output: artifacts/lcurve/ppo_epoch_ab_r5.jsonl (one row per (arm, seed))
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

from madrona_bots_tpu.config import EnvConfig
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.learn.a2c import init_train_states
from madrona_bots_tpu.learn.ppo import make_ppo_trainer
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator

NSEED = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
W = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
T = 16
BLOCK = 25
KEEP = ("entropy", "reward", "count", "loss")
ARMS = {"2x4": (2, 4), "1x8": (1, 8)}


def run(arm: str, seed: int):
    epochs, mbs = ARMS[arm]
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=128)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 128, cfg.hidden_state_dim,
                              seed=seed)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]
    it, opt = make_ppo_trainer(models, cfg, rollout_len=T,
                               num_minibatches=mbs, update_epochs=epochs,
                               use_pallas=True, compute_dtype=jnp.bfloat16,
                               learner_slots_per_class=10)
    tstates = init_train_states(models, jax.random.key(seed), opt)
    state = init_state(jax.random.key(seed + 1000), cfg)

    @partial(jax.jit, donate_argnums=(0, 1))
    def block(state, tstates, key):
        def body(carry, k):
            s, ts = carry
            s, ts, m = it(s, ts, k)
            keep = {f"species_{i}_{n}": m[f"species_{i}_{n}"]
                    for i in range(1, 5) for n in KEEP}
            return (s, ts), keep
        (state, tstates), ms = jax.lax.scan(
            body, (state, tstates), jax.random.split(key, BLOCK))
        return state, tstates, ms

    series = {}
    t0 = time.time()
    for b in range(ITERS // BLOCK):
        state, tstates, ms = block(
            state, tstates, jax.random.fold_in(jax.random.key(seed), b))
        ms = jax.device_get(ms)
        for k, v in ms.items():
            series.setdefault(k, []).append(np.asarray(v))
        if b == 0:
            t0 = time.time()  # drop the compile block from the rate
            n0 = BLOCK
        if b % 10 == 9:
            el = time.time() - t0
            done = (b + 1) * BLOCK
            print(f"{arm} seed {seed}: iter {done}/{ITERS} "
                  f"({(done - n0) * T * W / el / 1e3:.0f}k steps/s)",
                  flush=True)
    rate = (ITERS - BLOCK) * T * W / (time.time() - t0)
    out = {k: np.concatenate(v)[::5].astype(float).round(4).tolist()
           for k, v in series.items()}
    tail = {n: float(np.mean([np.asarray(series[f"species_{i}_{n}"])[-200:]
                              for i in range(1, 5)]))
            for n in KEEP}
    row = {"arm": arm, "seed": seed, "iters": ITERS, "worlds": W, "T": T,
           "env_steps_per_s": round(rate, 1), "tail200_mean": tail,
           "series": out}
    print(f"{arm} seed {seed}: {rate/1e3:.0f}k steps/s, tail {tail}",
          flush=True)
    return row


def main():
    rows = [run(arm, s) for arm in ARMS for s in range(NSEED)]
    path = "artifacts/lcurve/ppo_epoch_ab_r5.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
