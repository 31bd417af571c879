"""A2C learner-slot A/B: slots=12 (production default) vs slots=10
(VERDICT r4 item 7: +5% throughput measured in r4, but A2C compaction
drops AFFECT behavior — dropped overflow agents act null that tick).

Both arms run the fused A2C tick at the 8192-world bench config,
seed-matched; records learning series, measured env-steps/s, and the
dropped-agent fraction (dropped_rows / alive count) so the 5% can be
taken or declined with numbers.

Usage: python artifacts/a2c_slots_ab.py [seeds=2] [epochs=2000] [worlds=8192]
Output: artifacts/lcurve/a2c_slots_ab_r5.jsonl (one row per (arm, seed))
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
from madrona_bots_tpu.learn.a2c import init_train_states, make_train_tick
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator

NSEED = int(sys.argv[1]) if len(sys.argv) > 1 else 2
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
W = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
BLOCK = 50
KEEP = ("avg_action_entropy", "reward", "count", "total_loss",
        "dropped_rows")
ARMS = {"s12": 12, "s10": 10}


def run(arm: str, seed: int):
    slots = ARMS[arm]
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=128)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 128, cfg.hidden_state_dim,
                              seed=seed)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]
    tick, opt = make_train_tick(models, cfg, use_pallas=True,
                                compute_dtype=jnp.bfloat16,
                                learner_slots_per_class=slots)
    tstates = init_train_states(models, jax.random.key(seed), opt)
    state = init_state(jax.random.key(seed + 1000), cfg)

    @partial(jax.jit, donate_argnums=(0, 1))
    def block(state, tstates, key):
        def body(carry, k):
            s, ts = carry
            s, ts, m = tick(s, ts, k)
            keep = {f"species_{i}_{n}": m[f"species_{i}_{n}"]
                    for i in range(1, 5) for n in KEEP}
            return (s, ts), keep
        (state, tstates), ms = jax.lax.scan(
            body, (state, tstates), jax.random.split(key, BLOCK))
        return state, tstates, ms

    series = {}
    t0 = time.time()
    n0 = BLOCK
    for b in range(EPOCHS // BLOCK):
        state, tstates, ms = block(
            state, tstates, jax.random.fold_in(jax.random.key(seed), b))
        ms = jax.device_get(ms)
        for k, v in ms.items():
            series.setdefault(k, []).append(np.asarray(v))
        if b == 0:
            t0 = time.time()  # drop the compile block from the rate
    rate = (EPOCHS - n0) * W / (time.time() - t0)
    out = {k: np.concatenate(v)[::5].astype(float).round(4).tolist()
           for k, v in series.items()}
    tail = {n: float(np.mean([np.asarray(series[f"species_{i}_{n}"])[-200:]
                              for i in range(1, 5)]))
            for n in KEEP}
    # Dropped fraction = dropped learner rows / alive agents, averaged over
    # the whole run (drops also mean the agent acted null that tick).
    drop_frac = (np.sum([np.concatenate(series[f"species_{i}_dropped_rows"])
                         for i in range(1, 5)])
                 / max(1.0, np.sum([np.concatenate(
                     series[f"species_{i}_count"]) for i in range(1, 5)])))
    row = {"arm": arm, "slots": slots, "seed": seed, "epochs": EPOCHS,
           "worlds": W, "env_steps_per_s": round(rate, 1),
           "dropped_frac": round(float(drop_frac), 6),
           "tail200_mean": tail, "series": out}
    print(f"{arm} seed {seed}: {rate/1e3:.0f}k steps/s, "
          f"dropped {100*drop_frac:.4f}%, tail {tail}", flush=True)
    return row


def main():
    path = "artifacts/lcurve/a2c_slots_ab_r5.jsonl"
    open(path, "w").close()
    for arm in ARMS:
        for s in range(NSEED):
            row = run(arm, s)
            with open(path, "a") as f:
                f.write(json.dumps(row) + "\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
