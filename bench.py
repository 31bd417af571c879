"""Benchmark: aggregate env-steps/s on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north star of 10M
env-steps/s aggregate at 8192 worlds/chip (the reference publishes no
numbers — BASELINE.md). The north star is an aggregate pod-slice figure;
this harness measures ONE chip.

Measurement discipline: the step loop runs as `lax.scan` blocks of
BENCH_SCAN steps per dispatch (the TPU-native shape — rollouts never leave
the chip), and completion is forced by fetching a checksum scalar with
`jax.device_get`. `block_until_ready` alone is NOT a completion barrier
through the axon TPU tunnel (it returns at enqueue time and reports dispatch
rates ~1000x the real step time), so every timing here ends in a real
device->host value transfer.

Modes (env var BENCH_MODE): "env" (default) = pure simulator throughput at
8192 worlds (random actions resampled on device); "train" = fused A2C
actor-learner tick; "ppo" = full PPO iteration (rollout + GAE + minibatch
updates). Knobs: BENCH_WORLDS, BENCH_SCAN, BENCH_PALLAS=0 (jnp spec paths),
BENCH_DTYPE=f32, BENCH_A2C_SLOTS / BENCH_PPO_SLOTS (0 = no learner-row
compaction), BENCH_INIT_AGENTS=128 (saturated population).
"""

import json
import os
import sys
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def _checksum(state):
    return (state.alive.sum().astype(jnp.float32)
            + state.pos.sum()
            + state.sensor_depth.astype(jnp.uint32).sum().astype(jnp.float32))


def bench_env(num_worlds=8192, max_agents=128, iters=4, warmup=1,
              scan_len=None, use_pallas=None):
    from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
    from madrona_bots_tpu.env import env as env_mod
    from madrona_bots_tpu.env.state import init_state

    if use_pallas is None:
        # Pallas raycast is the production path (the XLA fori_loop sensor
        # streams [W, A, S] carries through HBM on all A target iterations);
        # BENCH_PALLAS=0 opts out.
        use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    K = scan_len or int(os.environ.get("BENCH_SCAN", "32"))
    # BENCH_INIT_AGENTS=128 reproduces the saturated-population row of
    # BASELINE.md (the sensor cost is O(population)).
    init_agents = int(os.environ.get("BENCH_INIT_AGENTS", "32"))
    cfg = EnvConfig(num_worlds=num_worlds, init_agents=init_agents,
                    max_agents=max_agents)

    @partial(jax.jit, donate_argnums=(0,))
    def block(state, key):
        def body(s, k):
            a = jax.random.randint(k, (num_worlds, max_agents), 0, NUM_ACTIONS)
            acts = jax.nn.one_hot(a, NUM_ACTIONS, dtype=jnp.int32)
            s = s.replace(action=acts)
            s = env_mod.sensor_pass(
                env_mod.step_systems(s, cfg, use_pallas), cfg, use_pallas)
            return s, ()
        state, _ = jax.lax.scan(body, state, jax.random.split(key, K))
        return state, _checksum(state)

    state = init_state(jax.random.key(0), cfg)
    key = jax.random.key(1)
    for i in range(warmup):
        state, c = block(state, jax.random.fold_in(key, i))
        float(jax.device_get(c))  # real completion barrier

    t0 = time.perf_counter()
    for i in range(iters):
        state, c = block(state, jax.random.fold_in(key, warmup + i))
    float(jax.device_get(c))  # blocks chain through the donated state
    dt = time.perf_counter() - t0
    return num_worlds * iters * K / dt


def bench_train(num_worlds=8192, max_agents=128, iters=2, warmup=1,
                scan_len=None, use_pallas=None):
    from madrona_bots_tpu.config import EnvConfig
    from madrona_bots_tpu.env.state import init_state
    from madrona_bots_tpu.learn.a2c import init_train_states, make_train_tick
    from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator

    if use_pallas is None:
        use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    K = scan_len or int(os.environ.get("BENCH_SCAN", "16"))
    # bf16 mixed precision (f32 master params/optimizer, bf16 activations) is
    # the TPU-idiomatic training configuration; BENCH_DTYPE=f32 opts out.
    compute_dtype = {"f32": None, "bf16": jnp.bfloat16}[
        os.environ.get("BENCH_DTYPE", "bf16")]
    cfg = EnvConfig(num_worlds=num_worlds, init_agents=32,
                    max_agents=max_agents)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 128, cfg.hidden_state_dim, seed=0)
    models = [ActorCritic.from_generator(gen) for _ in range(cfg.num_species)]
    # Learner-row compaction (BENCH_A2C_SLOTS, 0 = off): the per-world
    # one-hot gather feeds only ~alive rows to the 4 nets — the same
    # alive-only batch the reference's species sort produces. Default 10:
    # the r5 seed-matched A/B (artifacts/lcurve/a2c_slots_ab_r5.jsonl,
    # 2 seeds x 2000 epochs x 8192w) shows identical learning tails at
    # +7-8% throughput with 0.005% of agents acting null per tick
    # (A2C drops DO affect behavior — that fraction is the behavior cost).
    slots = int(os.environ.get("BENCH_A2C_SLOTS", "10")) or None
    # Species-stacked batched update (BENCH_STACKED=1 opts in,
    # models/stacked.py). r4 A/B on identical conditions: loop 293k vs
    # stacked 236k env-steps/s at 8192w — the r3 stacked win does not
    # reproduce on current code (the r3 number was never HW-recorded,
    # VERDICT r3 item 4), so the per-species loop is the default.
    stacked = (slots is not None
               and os.environ.get("BENCH_STACKED", "0") == "1")
    tick, opt = make_train_tick(models, cfg, use_pallas=use_pallas,
                                compute_dtype=compute_dtype,
                                learner_slots_per_class=slots,
                                stacked=stacked)
    if stacked:
        from madrona_bots_tpu.learn.a2c import init_stacked_train_state
        tstates = init_stacked_train_state(models, jax.random.key(1), opt)
    else:
        tstates = init_train_states(models, jax.random.key(1), opt)

    @partial(jax.jit, donate_argnums=(0, 1))
    def block(state, tstates, key):
        def body(carry, k):
            s, ts = carry
            s, ts, _ = tick(s, ts, k)
            return (s, ts), ()
        (state, tstates), _ = jax.lax.scan(
            body, (state, tstates), jax.random.split(key, K))
        return state, tstates, _checksum(state)

    state = init_state(jax.random.key(0), cfg)
    key = jax.random.key(2)
    for i in range(warmup):
        state, tstates, c = block(state, tstates, jax.random.fold_in(key, i))
        float(jax.device_get(c))
    t0 = time.perf_counter()
    for i in range(iters):
        state, tstates, c = block(state, tstates,
                                  jax.random.fold_in(key, warmup + i))
    float(jax.device_get(c))
    dt = time.perf_counter() - t0
    return num_worlds * iters * K / dt


def bench_ppo(num_worlds=8192, max_agents=128, iters=2, warmup=1,
              rollout_len=16, use_pallas=None):
    from madrona_bots_tpu.config import EnvConfig
    from madrona_bots_tpu.env.state import init_state
    from madrona_bots_tpu.learn.a2c import init_train_states
    from madrona_bots_tpu.learn.ppo import make_ppo_trainer
    from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator

    if use_pallas is None:
        use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    compute_dtype = {"f32": None, "bf16": jnp.bfloat16}[
        os.environ.get("BENCH_DTYPE", "bf16")]
    cfg = EnvConfig(num_worlds=num_worlds, init_agents=32,
                    max_agents=max_agents)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 128, cfg.hidden_state_dim, seed=0)
    models = [ActorCritic.from_generator(gen) for _ in range(cfg.num_species)]
    # Learner-row compaction (BENCH_PPO_SLOTS, 0 = off): only ~pop/Asub of
    # padded class slots are alive; the per-group one-hot compaction cuts
    # update rows ~2-2.7x with a dropped-row counter guarding correctness.
    # PPO compaction NEVER affects behavior (learner batch only). Default 8
    # (r5 knee: slots 10/9/8 = 291.9/304.4/321.0k env-steps/s at 8192w,
    # 0.069/0.254/0.851% of alive transitions untrained); the 3-seed
    # production-config bands (artifacts/lcurve/ppo_multiseed_r5.jsonl)
    # show slots=8 learning indistinguishable from the slots=12 no-drop
    # control within seed variance.
    slots = int(os.environ.get("BENCH_PPO_SLOTS", "8")) or None
    # Species-stacked PPO (BENCH_PPO_STACKED=1 opts in) is built and exact
    # (tests/test_stacked_ppo.py) but measured SLOWER than the loop at
    # 8192w on v5e — stage bisect: rollout 490 vs 348 ms (species-major
    # transposes of ~150 MB activations/step), update 338 vs 207 ms (the
    # minibatch updates are activation-HBM-bound, so cutting op count via
    # stacking buys nothing while the stack-of-slices adds copies).
    # Default stays the per-species loop; see BASELINE.md r4 notes.
    stacked = (slots is not None
               and os.environ.get("BENCH_PPO_STACKED", "0") == "1")
    it, opt = make_ppo_trainer(models, cfg, rollout_len=rollout_len,
                               use_pallas=use_pallas,
                               compute_dtype=compute_dtype,
                               learner_slots_per_class=slots,
                               stacked=stacked)
    if stacked:
        from madrona_bots_tpu.learn.a2c import init_stacked_train_state
        tstates = init_stacked_train_state(models, jax.random.key(1), opt)
    else:
        tstates = init_train_states(models, jax.random.key(1), opt)
    state = init_state(jax.random.key(0), cfg)
    key = jax.random.key(2)
    for i in range(warmup):
        state, tstates, m = it(state, tstates, jax.random.fold_in(key, i))
        float(jax.device_get(_checksum(state)))
    t0 = time.perf_counter()
    for i in range(iters):
        state, tstates, m = it(state, tstates,
                               jax.random.fold_in(key, warmup + i))
    float(jax.device_get(_checksum(state)))
    dt = time.perf_counter() - t0
    if slots is not None and "species_1_dropped_rows" in m:
        dropped = sum(float(m[f"species_{i}_dropped_rows"])
                      for i in range(1, cfg.num_species + 1))
        total = rollout_len * num_worlds * (max_agents // cfg.num_species)
        print(f"learner compaction slots={slots}: dropped "
              f"{dropped:.0f}/{total * cfg.num_species} alive rows "
              f"({100 * dropped / max(1, total * cfg.num_species):.4f}%)",
              file=sys.stderr)
    return num_worlds * iters * rollout_len / dt


def main():
    # Default mode "all" measures env + train (stacked A2C) + ppo in ONE run
    # so every round's BENCH_r0N.json records the full perf story. Each mode
    # prints its own JSON line; the FINAL line is the driver-parsed headline
    # (env metric) and carries the train/ppo numbers as extra keys.
    mode = os.environ.get("BENCH_MODE", "all")
    num_worlds = int(os.environ.get("BENCH_WORLDS", "8192"))
    north_star = 1e7  # BASELINE.json: >=10M env-steps/s aggregate (pod slice)

    def line(metric, value, **extra):
        print(json.dumps({
            "metric": metric,
            "value": round(value, 1),
            "unit": "env-steps/s",
            "vs_baseline": round(value / north_star, 4),
            **extra,
        }), flush=True)

    if mode == "train":
        line(f"train_env_steps_per_sec_{num_worlds}w",
             bench_train(num_worlds=num_worlds))
    elif mode == "ppo":
        line(f"ppo_env_steps_per_sec_{num_worlds}w",
             bench_ppo(num_worlds=num_worlds))
    elif mode == "env":
        line(f"env_steps_per_sec_{num_worlds}w",
             bench_env(num_worlds=num_worlds))
    else:  # all
        train_v = bench_train(num_worlds=num_worlds)
        line(f"train_env_steps_per_sec_{num_worlds}w", train_v)
        ppo_v = bench_ppo(num_worlds=num_worlds)
        line(f"ppo_env_steps_per_sec_{num_worlds}w", ppo_v)
        env_v = bench_env(num_worlds=num_worlds)
        line(f"env_steps_per_sec_{num_worlds}w", env_v,
             train_env_steps_per_sec=round(train_v, 1),
             ppo_env_steps_per_sec=round(ppo_v, 1))


if __name__ == "__main__":
    main()
