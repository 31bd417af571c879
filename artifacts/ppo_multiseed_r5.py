"""PPO multi-seed bands at the PRODUCTION operating point (VERDICT r4
item 6): 8192 worlds, bf16, the r5 1x8 update schedule, and the
aggressive learner-slot knee (slots=8, ~0.85% of alive transitions left
untrained per step) — plus one slots=12 control seed as the no-drop
anchor. If the slots=8 tails sit inside the control/2048w bands, the
321k env-steps/s configuration is legitimized end-to-end.

Usage: python artifacts/ppo_multiseed_r5.py [seeds=3] [iters=1500] [worlds=8192]
Output: artifacts/lcurve/ppo_multiseed_r5.jsonl (appended per run)
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
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
W = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
T = 16
BLOCK = 25
KEEP = ("entropy", "reward", "count", "loss")
PATH = "/root/repo/artifacts/lcurve/ppo_multiseed_r5.jsonl"


def run(seed: int, slots: int):
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=128)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 128, cfg.hidden_state_dim,
                              seed=seed)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]
    it, opt = make_ppo_trainer(models, cfg, rollout_len=T, use_pallas=True,
                               compute_dtype=jnp.bfloat16,
                               learner_slots_per_class=slots)
    tstates = init_train_states(models, jax.random.key(seed), opt)
    state = init_state(jax.random.key(seed + 1000), cfg)

    @partial(jax.jit, donate_argnums=(0, 1))
    def block(state, tstates, key):
        def body(carry, k):
            s, ts = carry
            s, ts, m = it(s, ts, k)
            keep = {f"species_{i}_{n}": m[f"species_{i}_{n}"]
                    for i in range(1, 5) for n in KEEP}
            keep["dropped"] = sum(m[f"species_{i}_dropped_rows"]
                                  for i in range(1, 5))
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
            t0 = time.time()
        if b % 8 == 7:
            el = time.time() - t0
            print(f"slots={slots} seed {seed}: iter {(b+1)*BLOCK}/{ITERS} "
                  f"({b*BLOCK*T*W/el/1e3:.0f}k steps/s)", flush=True)
    rate = (ITERS - BLOCK) * T * W / (time.time() - t0)
    out = {k: np.concatenate(v)[::10].astype(float).round(4).tolist()
           for k, v in series.items()}
    tail = {n: float(np.mean([np.asarray(
        np.concatenate(series[f"species_{i}_{n}"]))[-200:]
        for i in range(1, 5)])) for n in KEEP}
    drop_frac = float(np.mean(np.concatenate(series["dropped"]))
                      / (T * W * 32 * 1.05))  # ~alive transitions/iter
    row = {"slots": slots, "seed": seed, "iters": ITERS, "worlds": W,
           "rollout_len": T, "env_steps_per_s": round(rate, 1),
           "tail200_mean": tail, "series_every": 10, "series": out}
    print(f"slots={slots} seed {seed}: {rate/1e3:.0f}k steps/s, "
          f"tail {tail}, drop~{100*drop_frac:.3f}%", flush=True)
    with open(PATH, "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def main():
    open(PATH, "w").close()
    rows = [run(seed, 8) for seed in range(NSEED)]
    ctrl = run(0, 12)
    summary = {"kind": "summary", "seeds": NSEED, "iters": ITERS,
               "worlds": W, "slots": 8}
    for n in KEEP:
        finals = [r["tail200_mean"][n] for r in rows]
        summary[n] = {"mean": round(float(np.mean(finals)), 4),
                      "sd": round(float(np.std(finals)), 4),
                      "range": [round(min(finals), 4),
                                round(max(finals), 4)],
                      "control_slots12": round(ctrl["tail200_mean"][n], 4)}
    with open(PATH, "a") as f:
        f.write(json.dumps(summary) + "\n")
    print("summary:", json.dumps(summary))


if __name__ == "__main__":
    main()
