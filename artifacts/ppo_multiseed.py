"""PPO multi-seed learning-curve variance bands (VERDICT r3 item 5).

The PPO analogue of lcurve_seeds.py: N seeds x ITERS full PPO iterations
(rollout T=16 + GAE + 2x4 clipped-surrogate minibatch epochs) at the
reference world count, with the production configuration — record
compaction (learner_slots=12), bf16 compute (the per-species loop update:
the stacked variant measured slower on v5e, see BASELINE.md r4).
Per-seed universes regenerate their architectures exactly as
--create_universe does. Writes one JSONL row per seed with downsampled
entropy/reward/population/loss series + a cross-seed band summary.

Usage: python artifacts/ppo_multiseed.py [seeds=3] [iters=2000] [worlds=2048]
Output: artifacts/lcurve/ppo_multiseed_r4.jsonl
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

NSEED = int(sys.argv[1]) if len(sys.argv) > 1 else 3
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
W = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
T = 16
BLOCK = 25  # PPO iterations per scan dispatch
KEEP = ("entropy", "reward", "count", "loss")


def run(seed: int):
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=128)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 128, cfg.hidden_state_dim,
                              seed=seed)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]
    it, opt = make_ppo_trainer(models, cfg, rollout_len=T, use_pallas=True,
                               compute_dtype=jnp.bfloat16,
                               learner_slots_per_class=12)
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
        ms = jax.device_get(ms)  # completion barrier + data
        for k, v in ms.items():
            series.setdefault(k, []).append(np.asarray(v))
        if b % 8 == 0:
            el = time.time() - t0
            print(f"seed {seed}: iter {(b + 1) * BLOCK}/{ITERS} "
                  f"({(b + 1) * BLOCK * T * W / el / 1e3:.0f}k steps/s)",
                  flush=True)
    dt = time.time() - t0
    out = {k: np.concatenate(v)[::10].astype(float).round(4).tolist()
           for k, v in series.items()}
    return {"seed": seed, "iters": ITERS, "worlds": W, "rollout_len": T,
            "env_steps_per_s": round(ITERS * T * W / dt, 1),
            "series_every": 10, "series": out}


def main():
    rows = [run(seed) for seed in range(NSEED)]
    path = "/root/repo/artifacts/lcurve/ppo_multiseed_r4.jsonl"
    # Cross-seed final-value bands (mean over species of the tail mean).
    summary = {"kind": "summary", "seeds": NSEED, "iters": ITERS,
               "worlds": W}
    for n in KEEP:
        finals = []
        for r in rows:
            vals = [np.mean(r["series"][f"species_{i}_{n}"][-20:])
                    for i in range(1, 5)]
            finals.append(float(np.mean(vals)))
        summary[n] = {"mean": round(float(np.mean(finals)), 4),
                      "sd": round(float(np.std(finals)), 4),
                      "range": [round(min(finals), 4),
                                round(max(finals), 4)]}
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps(summary) + "\n")
    print("summary:", json.dumps(summary))


if __name__ == "__main__":
    main()
