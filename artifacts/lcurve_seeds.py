"""Multi-seed learning-curve variance bands (VERDICT r3 item 5).

Runs N seeds x EPOCHS fused-A2C epochs at the reference configuration
(2048 worlds x 32 init agents, reward setting 8, quirk_compat observations)
for BOTH objectives: the reference's raw-logit actor loss and the
--proper_log_probs fix. Writes one JSONL row per (objective, seed) with
downsampled metric series, plus a summary with cross-seed bands.

Usage: python artifacts/lcurve_seeds.py [seeds=5] [epochs=3200]
Output: artifacts/lcurve/multiseed_r3.jsonl
"""
import json, sys, time
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

W = 2048
NSEED = int(sys.argv[1]) if len(sys.argv) > 1 else 5
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 3200
BLOCK = 160  # epochs per scan dispatch
KEEP = ("avg_action_entropy", "count_per_world", "reward", "avg_health")


def run(proper_log_probs: bool, seed: int, tick, models):
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=128)
    from madrona_bots_tpu.learn.a2c import make_optimizer
    tstates = init_train_states(models, jax.random.key(seed),
                                make_optimizer())
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
    for b in range(EPOCHS // BLOCK):
        state, tstates, ms = block(state, tstates,
                                   jax.random.fold_in(jax.random.key(seed), b))
        ms = jax.device_get(ms)  # completion barrier + data
        for k, v in ms.items():
            series.setdefault(k, []).append(np.asarray(v))
    dt = time.time() - t0
    fps = EPOCHS * W / dt
    # Downsample to every 20th epoch for the artifact.
    out = {k: np.concatenate(v)[::20].astype(float).round(4).tolist()
           for k, v in series.items()}
    return {"objective": "proper" if proper_log_probs else "raw_logit",
            "seed": seed, "epochs": EPOCHS, "worlds": W, "fps": round(fps, 1),
            "series_every": 20, "series": out}


def main():
    cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=128)
    rows = []
    for proper in (False, True):
        # Architectures are part of the universe seed: regenerate per seed
        # exactly as --create_universe does.
        for seed in range(NSEED):
            gen = SpeciesNetGenerator(cfg.obs_dim, 6, 128,
                                      cfg.hidden_state_dim, seed=seed)
            models = [ActorCritic.from_generator(gen) for _ in range(4)]
            tick, _ = make_train_tick(
                models, cfg, proper_log_probs=proper, quirk_compat=True,
                use_pallas=True, compute_dtype=jnp.bfloat16,
                learner_slots_per_class=12)
            row = run(proper, seed, tick, models)
            rows.append(row)
            print(f"{row['objective']} seed {seed}: fps {row['fps']}",
                  flush=True)

    with open("artifacts/lcurve/multiseed_r3.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    # Cross-seed bands at the final epoch, per objective.
    for obj in ("raw_logit", "proper"):
        sel = [r for r in rows if r["objective"] == obj]
        for metric in KEEP:
            finals = [np.mean([r["series"][f"species_{i}_{metric}"][-1]
                               for i in range(1, 5)]) for r in sel]
            print(f"{obj:10s} {metric:22s} final mean "
                  f"{np.mean(finals):8.3f} +- {np.std(finals):6.3f} "
                  f"(range {min(finals):.3f}..{max(finals):.3f})", flush=True)


if __name__ == "__main__":
    main()
