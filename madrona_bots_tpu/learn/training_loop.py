"""Training CLI — parity with learn/training_loop.py plus TPU-native scaling.

Same flags and flow as the reference (training_loop.py:225-246): per-species
ActorCritic creation/restore under a "universe" checkpoint dir, per-tick
TD(0) updates, wandb-style metrics, best-metric checkpointing, FPS report.

TPU-native differences:
- the whole tick (sim step + 4 species updates + write-back + shift) is ONE
  jitted function (learn/a2c.py); `--ticks_per_block` scans several ticks
  between host syncs (metrics/checkpoint cadence), so the device never waits
  on Python.
- `--num_devices > 1` shards worlds over a device mesh with replicated
  params and psum'd gradients (parallel/sharded.py).
"""

from __future__ import annotations

import argparse
import os
import time

import jax

# Persistent XLA compile cache: the remote-TPU tunnel compiles are minutes;
# repeat CLI invocations with the same shapes should be near-instant.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from madrona_bots_tpu.config import EnvConfig, RewardSetting
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.learn.a2c import (init_train_states, make_train_tick,
                                        make_optimizer)
from madrona_bots_tpu.learn.ckpt import CheckpointManager
from madrona_bots_tpu.learn.metrics import MetricsLogger
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator


def construct_run_name(args) -> str:
    """Run-name encodes universe + reward-setting id (training_loop.py:140-151)."""
    return f"universe_{args.universe_id}-r{args.reward_setting}"


def train(args):
    run_name = construct_run_name(args)
    cfg = EnvConfig(num_worlds=args.num_worlds, init_agents=32,
                    max_agents=args.max_agents,
                    num_species=args.num_species,
                    reward_setting=RewardSetting(args.reward_setting))
    logger = MetricsLogger(use_wandb=args.use_wandb, run_name=run_name,
                           config=vars(args),
                           jsonl_path=os.path.join(args.model_save_dir,
                                                   f"{run_name}.metrics.jsonl"))

    base_ckpt_dir = os.path.join(args.model_save_dir, f"universe_{args.universe_id}")
    if args.create_universe:
        assert not os.path.exists(base_ckpt_dir), \
            f"Universe {args.universe_id} already exists"
    else:
        assert os.path.exists(base_ckpt_dir), \
            f"Universe {args.universe_id} does not exist"

    ckpt = CheckpointManager(base_ckpt_dir, restore=True)
    gen = SpeciesNetGenerator(args.obs_dim, args.action_dim, args.hidden_dim,
                              args.memory_dim, seed=args.seed)
    if args.stacked and args.learner_slots is None:
        # The stacked batched update trains on compacted learner rows; 12
        # slots/class covers typical populations with zero drops (bench.py
        # default, BASELINE.md).
        args.learner_slots = 12
        print("--stacked: defaulting --learner_slots to 12")
    # Checkpoints are ALWAYS per-species (reference layout), so the
    # universe dir is interchangeable between --stacked and loop runs; the
    # per-species optimizer defines the on-disk opt-state format.
    if args.algo == "ppo":
        from madrona_bots_tpu.learn.ppo import make_ppo_optimizer
        optimizer = make_ppo_optimizer(args.lr)
    else:
        optimizer = make_optimizer(args.lr)

    models, tstates, start_epochs = [], [], []
    init_key = jax.random.key(args.seed)
    for sp in range(1, args.num_species + 1):
        if args.create_universe:
            print(f"Creating universe: new model for species {sp}...")
            model = ActorCritic.from_generator(gen)
            print(f"Species {sp} model: ", model.get_config())
            params = model.init(jax.random.fold_in(init_key, sp))
            opt_state = optimizer.init(params)
            ckpt.save(model, params, opt_state, f"species_{sp}", 0,
                      metric_name="latest", verbose=True)
            start_epochs.append(0)
        else:
            print(f"Loading cached model for species {sp}...")
            model, params, opt_state, epoch = ckpt.load(
                ActorCritic, optimizer, f"species_{sp}",
                metric_name=args.model_load, verbose=True)
            start_epochs.append(epoch)
        models.append(model)
        from madrona_bots_tpu.learn.a2c import SpeciesTrainState
        tstates.append(SpeciesTrainState(params, opt_state))
    tstates = tuple(tstates)
    compute_dtype = {"f32": None, "bf16": jnp.bfloat16}[args.compute_dtype]

    sac = None
    if args.stacked:
        # Stack the restored per-species params AND Adam moments into the
        # single stacked train state (exact resume: stack_opt_state routes
        # the flattened moment vectors through the stacked layout). The
        # stacked PPO optimizer clips per species, so its state converts
        # 1:1 with the per-species one (tests/test_stacked_ppo.py).
        from madrona_bots_tpu.models.stacked import StackedActorCritic
        from madrona_bots_tpu.learn.a2c import SpeciesTrainState
        sac = StackedActorCritic(models)
        params_list = [ts.params for ts in tstates]
        sp = sac.stack_params(params_list)
        opt_st = sac.stack_opt_state([ts.opt_state for ts in tstates],
                                     params_list, sp)
        tstates = SpeciesTrainState(sp, opt_st)
        if args.algo == "ppo":
            from madrona_bots_tpu.learn.ppo import make_stacked_ppo_optimizer
            optimizer = make_stacked_ppo_optimizer(args.num_species, args.lr)

    def species_states(ts):
        """Per-species (params, opt_state) views for checkpointing."""
        if not args.stacked:
            return ts
        from madrona_bots_tpu.learn.a2c import SpeciesTrainState
        ps = sac.unstack_params(ts.params)
        os_ = sac.unstack_opt_state(ts.opt_state, ps, ts.params)
        return [SpeciesTrainState(p, o) for p, o in zip(ps, os_)]

    if args.algo == "ppo":
        # PPO scale path (BASELINE configs 2-4): one "epoch" = one PPO
        # iteration of `--rollout_len` on-device env steps + minibatch epochs.
        from madrona_bots_tpu.learn.ppo import make_ppo_trainer
        tick, _ = make_ppo_trainer(models, cfg, rollout_len=args.rollout_len,
                                   gamma=args.gamma, lr=args.lr,
                                   use_pallas=args.use_pallas,
                                   optimizer=optimizer,
                                   compute_dtype=compute_dtype,
                                   learner_slots_per_class=args.learner_slots,
                                   stacked=args.stacked)
        state = init_state(jax.random.key(args.seed), cfg)
        if args.use_mesh:
            from madrona_bots_tpu.parallel import make_mesh, shard_state
            state = shard_state(state, make_mesh())
    elif args.use_mesh:
        from madrona_bots_tpu.parallel import (make_mesh,
                                               make_sharded_train_tick,
                                               shard_state)
        mesh = make_mesh()
        tick, _ = make_sharded_train_tick(
            models, cfg, mesh, lr=args.lr, gamma=args.gamma,
            proper_log_probs=args.proper_log_probs,
            use_pallas=args.use_pallas, compute_dtype=compute_dtype,
            quirk_compat=args.quirk_compat,
            learner_slots_per_class=args.learner_slots,
            stacked=args.stacked)
        state = shard_state(init_state(jax.random.key(args.seed), cfg), mesh)
        print(f"mesh: {len(mesh.devices.flat)} devices, worlds sharded")
    else:
        tick, _ = make_train_tick(models, cfg, lr=args.lr, gamma=args.gamma,
                                  proper_log_probs=args.proper_log_probs,
                                  quirk_compat=args.quirk_compat,
                                  use_pallas=args.use_pallas,
                                  compute_dtype=compute_dtype,
                                  learner_slots_per_class=args.learner_slots,
                                  stacked=args.stacked)
        state = init_state(jax.random.key(args.seed), cfg)
    key = jax.random.key(args.seed + 1)

    tpb = max(1, args.ticks_per_block)
    NSp = args.num_species
    best_metric_names = ("actor_loss", "critic_loss", "total_loss")
    if tpb > 1:
        # Amortize host sync: scan tpb ticks per device roundtrip; per-tick
        # metrics still stream out (stacked along the scan axis).
        import functools

        # Metrics leave the device as ONE stacked array: the axon tunnel (and
        # remote TPU transports generally) has high per-transfer latency, so
        # fetching ~30 small arrays separately costs seconds per block.
        metric_keys = sorted(jax.eval_shape(
            tick, state, tstates, jax.random.key(0))[2].keys())
        # On-device best tracking: the reference saves the IMPROVING epoch's
        # params (training_loop.py:121-133); per-tick params never reach the
        # host in block mode, so snapshot them inside the scan whenever a
        # tracked metric improves, and save the snapshots at block end.
        have_best = all(f"species_1_{m}" in metric_keys
                        for m in best_metric_names)

        # For --stacked, per-species "train state" views snapshot the whole
        # stacked tree (tiny nets; 12 copies is ~30 MB) — unstacked to the
        # right species only at file-save time.
        ts_view = ((lambda ts, sp: ts) if args.stacked
                   else (lambda ts, sp: ts[sp]))

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def block(state, tstates, key, best_vals):
            # Snapshot trees (3 deep copies of params+Adam state) only when
            # best tracking is live — PPO block mode never uses them, so
            # carrying them would cost ~3x train-state HBM for nothing.
            snaps0 = (tuple(tuple(jax.tree.map(jnp.copy, ts_view(tstates, sp))
                                  for sp in range(NSp))
                            for _ in best_metric_names) if have_best else ())
            best_idx0 = jnp.full((len(best_metric_names), NSp), -1, jnp.int32)

            def body(carry, i):
                s, ts, k, bv, snaps, bidx = carry
                k, sub = jax.random.split(k)
                s, ts, m = tick(s, ts, sub)
                if have_best:
                    new_snaps = []
                    for mi, mn in enumerate(best_metric_names):
                        row = []
                        for sp in range(NSp):
                            v = m[f"species_{sp+1}_{mn}"].astype(jnp.float32)
                            better = v < bv[mi, sp]
                            bv = bv.at[mi, sp].set(jnp.where(better, v, bv[mi, sp]))
                            bidx = bidx.at[mi, sp].set(
                                jnp.where(better, i, bidx[mi, sp]))
                            row.append(jax.tree.map(
                                lambda a, b: jnp.where(better, a, b),
                                ts_view(ts, sp), snaps[mi][sp]))
                        new_snaps.append(tuple(row))
                    snaps = tuple(new_snaps)
                return (s, ts, k, bv, snaps, bidx), m

            (state, tstates, _, bv, snaps, bidx), ms = jax.lax.scan(
                body, (state, tstates, key, best_vals, snaps0, best_idx0),
                jnp.arange(tpb))
            stacked = jnp.stack(
                [ms[k].astype(jnp.float32) for k in metric_keys], axis=1)
            return state, tstates, stacked, bv, snaps, bidx

    best = {m: [float("inf")] * args.num_species
            for m in ("actor_loss", "critic_loss", "total_loss")}
    time_values = []

    # Multi-host runs: params are replicated, so only the coordinator
    # process writes checkpoints/metrics (parallel.distributed).
    if jax.process_count() > 1:
        from madrona_bots_tpu.parallel.distributed import is_coordinator
        if not is_coordinator():
            class _NullCkpt:
                def save(self, *a, **k):
                    pass
            ckpt = _NullCkpt()
            logger.log = lambda *a, **k: None

    def handle_epoch(rel_epoch, host_metrics, dt, save: bool = True,
                     track_best: bool = True):
        """Log one epoch; with track_best=False (block mode) only logging
        runs here — best-metric tracking and the improving-tick param
        snapshots happen ON DEVICE inside the scanned block, and the files
        are written once per block from those snapshots."""
        if rel_epoch % args.print_freq == 0 or rel_epoch == 1:
            print("Relative Epoch ", rel_epoch)
        host_metrics["epoch_fps"] = args.num_worlds / dt
        if not track_best:
            logger.log(host_metrics)
            return
        sps = species_states(tstates) if save else None
        for sp in range(args.num_species):
            epoch = start_epochs[sp] + rel_epoch
            host_metrics[f"species_{sp+1}_learning_rate"] = args.lr
            host_metrics["epoch"] = epoch
            if save and rel_epoch % args.ckpt_every == 0:
                ckpt.save(models[sp], sps[sp].params, sps[sp].opt_state,
                          f"species_{sp+1}", epoch, metric_name="latest",
                          verbose=args.verbose)
            for metric in best_metric_names:
                v = host_metrics.get(f"species_{sp+1}_{metric}")
                if v is None:  # PPO uses its own metric names
                    continue
                if v < best[metric][sp]:
                    best[metric][sp] = v
                    if save:
                        ckpt.save(models[sp], sps[sp].params,
                                  sps[sp].opt_state, f"species_{sp+1}",
                                  epoch, metric_name=metric,
                                  verbose=args.verbose)
        logger.log(host_metrics)

    if tpb == 1:
        for rel_epoch in range(1, args.num_epochs + 1):
            t0 = time.time()
            key, sub = jax.random.split(key)
            state, tstates, metrics = tick(state, tstates, sub)
            jax.block_until_ready(state.alive)
            dt = time.time() - t0
            time_values.append(dt)
            handle_epoch(rel_epoch, {k: float(v) for k, v in metrics.items()},
                         dt)
    else:
        rel_epoch = 0
        while rel_epoch < args.num_epochs:
            block_start = rel_epoch
            t0 = time.time()
            key, sub = jax.random.split(key)
            best_vals_in = jnp.asarray(
                [[best[m][sp] for sp in range(args.num_species)]
                 for m in best_metric_names], jnp.float32)
            state, tstates, ms, bv, snaps, bidx = block(
                state, tstates, sub, best_vals_in)
            host_stack = np.asarray(ms)          # one [tpb, M] transfer
            dt = (time.time() - t0) / tpb
            for j in range(tpb):
                rel_epoch += 1
                time_values.append(dt)
                handle_epoch(
                    rel_epoch,
                    dict(zip(metric_keys, host_stack[j].tolist())), dt,
                    track_best=False)
                if rel_epoch >= args.num_epochs:
                    break
            # One save pass per block: latest (end-of-block params) + any
            # best that improved, from its improving-tick device snapshot.
            sps = species_states(tstates)
            for sp in range(args.num_species):
                ckpt.save(models[sp], sps[sp].params, sps[sp].opt_state,
                          f"species_{sp+1}", start_epochs[sp] + rel_epoch,
                          metric_name="latest", verbose=args.verbose)
            if have_best:
                bv_h = np.asarray(bv)
                bidx_h = np.asarray(bidx)
                for mi, metric in enumerate(best_metric_names):
                    for sp in range(args.num_species):
                        if bv_h[mi, sp] < best[metric][sp]:
                            best[metric][sp] = float(bv_h[mi, sp])
                            epoch = (start_epochs[sp] + block_start
                                     + int(bidx_h[mi, sp]) + 1)
                            snap = snaps[mi][sp]
                            if args.stacked:
                                snap = species_states(snap)[sp]
                            ckpt.save(models[sp], snap.params, snap.opt_state,
                                      f"species_{sp+1}", epoch,
                                      metric_name=metric, verbose=args.verbose)

    if time_values:
        avg = (float(np.mean(time_values[1:])) if len(time_values) > 1
               else time_values[0])
        print(f"Average FPS for simulator: {args.num_worlds / avg}")
    logger.finish()
    return state, tstates


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Training loop for species simulation.")
    # Reference flags (training_loop.py:225-246)
    parser.add_argument('--num_worlds', type=int, default=2048)
    parser.add_argument('--universe_id', type=str, default='luc')
    parser.add_argument('--num_species', type=int, default=4)
    parser.add_argument('--obs_dim', type=int, default=69)
    parser.add_argument('--hidden_dim', type=int, default=128)
    parser.add_argument('--action_dim', type=int, default=6)
    parser.add_argument('--memory_dim', type=int, default=16)
    parser.add_argument('--lr', type=float, default=3e-4)
    parser.add_argument('--init_epsilon', type=float, default=0.5)
    parser.add_argument('--num_epochs', type=int, default=100)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--use_wandb', action='store_true')
    parser.add_argument('--create_universe', action='store_true')
    parser.add_argument('--model_save_dir', type=str, default='checkpoints')
    parser.add_argument('--model_load', type=str, default='latest')
    parser.add_argument('--enable_viewer', action='store_true')
    parser.add_argument('--verbose', action='store_true')
    # TPU-native extras
    parser.add_argument('--max_agents', type=int, default=128)
    parser.add_argument('--gamma', type=float, default=1.0)
    parser.add_argument('--reward_setting', type=int, default=8)
    parser.add_argument('--proper_log_probs', action='store_true',
                        help='use log-softmax instead of raw logits in the '
                             'actor loss (fixes a reference quirk)')
    parser.add_argument('--quirk_compat', action='store_true',
                        help='train on the exact reference observation: '
                             'depth block = semantic bytes (Q1) and health '
                             'bit-reinterpreted int32->f32 (Q2)')
    parser.add_argument('--use_pallas', action='store_true',
                        help='Pallas raycast kernel for the sensor pass')
    parser.add_argument('--ckpt_every', type=int, default=1)
    parser.add_argument('--print_freq', type=int, default=10)
    parser.add_argument('--ticks_per_block', type=int, default=1,
                        help='scan N ticks per host sync (throughput mode)')
    parser.add_argument('--use_mesh', action='store_true',
                        help='shard worlds over all available devices')
    parser.add_argument('--compute_dtype', choices=['f32', 'bf16'],
                        default='f32', help='forward-pass precision')
    parser.add_argument('--algo', choices=['a2c', 'ppo'], default='a2c',
                        help='a2c = reference-parity TD(0); ppo = scale path')
    parser.add_argument('--rollout_len', type=int, default=16,
                        help='PPO: env steps per iteration')
    parser.add_argument('--learner_slots', type=int, default=None,
                        help='cap learner rows per (world, species) via '
                             'on-device compaction; None trains on all '
                             'padded slots')
    parser.add_argument('--stacked', action='store_true',
                        help='run all species through ONE species-stacked '
                             'batched net (models/stacked.py): ~NSx fewer '
                             'XLA ops per update at identical per-species '
                             'math; checkpoints stay per-species (exact '
                             'resume both ways). Implies --learner_slots '
                             '(default 12). Works with a2c and ppo.')
    args = parser.parse_args(argv)
    train(args)


if __name__ == "__main__":
    main()
