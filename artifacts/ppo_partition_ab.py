"""PPO minibatch-partition A/B (VERDICT r1 next-step 2).

Compares learning quality of the round-1 FIXED stride partition (one
grouping reused across epochs and iterations) against the round-2
decorrelated partition (per-iteration row roll + per-epoch class
rotation), holding everything else fixed: same env seed, same init params,
same action-sampling keys. Writes per-iteration metrics for both arms to
artifacts/ppo_partition_ab.jsonl and a comparison plot.

Usage: python artifacts/ppo_partition_ab.py [iters] [worlds]
"""
import json
import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

from madrona_bots_tpu.config import EnvConfig
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.learn.a2c import init_train_states
from madrona_bots_tpu.learn.ppo import make_ppo_trainer
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator


def run(decorrelate, iters, worlds):
    cfg = EnvConfig(num_worlds=worlds, init_agents=32, max_agents=128)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 128, cfg.hidden_state_dim,
                              seed=0)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]
    it, opt = make_ppo_trainer(models, cfg, use_pallas=True,
                               compute_dtype=jnp.bfloat16,
                               learner_slots_per_class=12,
                               decorrelate=decorrelate)
    ts = init_train_states(models, jax.random.key(1), opt)
    state = init_state(jax.random.key(0), cfg)
    rows = []
    for i in range(iters):
        state, ts, m = it(state, ts, jax.random.fold_in(jax.random.key(2), i))
        host = {k: float(v) for k, v in m.items()}
        host["iter"] = i
        host["arm"] = "decorrelated" if decorrelate else "fixed"
        rows.append(host)
        if i % 10 == 0:
            print(f"arm={host['arm']} iter {i} "
                  f"reward1={host['species_1_reward']:.0f} "
                  f"ent1={host['species_1_entropy']:.3f}", flush=True)
    return rows


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    worlds = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    rows = run(False, iters, worlds) + run(True, iters, worlds)
    out = "/root/repo/artifacts/ppo_partition_ab.jsonl"
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    for metric, ax in zip(("loss", "entropy", "reward", "pg_loss"),
                          axes.flat):
        for arm, style in (("fixed", "--"), ("decorrelated", "-")):
            ys = [sum(r[f"species_{s}_{metric}"] for s in range(1, 5)) / 4
                  for r in rows if r["arm"] == arm]
            ax.plot(ys, style, label=arm)
        ax.set_title(f"mean species {metric}")
        ax.legend()
    fig.suptitle("PPO minibatch partition A/B (same seeds)")
    fig.tight_layout()
    fig.savefig("/root/repo/artifacts/ppo_partition_ab.png", dpi=110)
    print("wrote", out, "and ppo_partition_ab.png")


if __name__ == "__main__":
    main()
