"""PPO actor-learner with on-device rollout buffers.

BASELINE.json's north star names PPO as the scaling algorithm (configs 2-4);
the reference itself only ships TD(0)-A2C (models.py:180-184), so A2C
(learn/a2c.py) is the learning-curve-parity path and this module is the
scale path. Everything stays on device: `lax.scan` collects a T-step rollout
(with learner slots set, each step record-compacts the learner rows via one
batched gather — RolloutC), GAE runs over the scan axis, and each species
takes clipped-surrogate minibatch updates. Worlds shard over the mesh like
the A2C path; gradients psum via GSPMD.

Minibatch discipline (TPU-native): a random permutation per epoch would be a
million-row gather, which TPU serializes. Instead rows keep their
[T, W, Asub] layout and minibatch c = rows congruent to c (mod M) — a plain
strided slice. Two cheap decorrelators replace the shuffle:
  * per PPO iteration, every species buffer is rolled along the row axis by
    a key-derived offset, so stride-class membership changes between
    iterations;
  * per update epoch e, minibatch i visits class (i + e) % M, so Adam sees
    the classes in a different order each epoch.

Mixed precision: with compute_dtype=jnp.bfloat16 the policy forwards (both
rollout and update) run in bf16 against f32 master params; GAE, losses,
grads and Adam state stay f32.

Slot semantics: capacity slots are reused by births/respawns, but only slots
that were dead at step start can be claimed (SPEC §4.6), so `alive[t] &
alive[t+1]` guarantees the same agent occupies the slot across the
transition; death at t+1 terminates the trajectory with bootstrap 0.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from madrona_bots_tpu.config import NUM_ACTIONS, EnvConfig
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.state import WorldState
from madrona_bots_tpu.learn.a2c import SpeciesTrainState
from madrona_bots_tpu.learn.pack import compact_gather, compact_slots, split3
from madrona_bots_tpu.models.actor_critic import ActorCritic

f32 = jnp.float32
bf16 = jnp.bfloat16


class Rollout(NamedTuple):
    """[T, W, A, ...] compact per-step records."""
    depth: jax.Array        # u8  [T, W, A, S]
    semantic: jax.Array     # i8  [T, W, A, S]
    health: jax.Array       # i32 [T, W, A]
    pos: jax.Array          # f32 [T, W, A, 2]
    surrounding: jax.Array  # f32 [T, W, A, 2]
    memory: jax.Array       # f32 [T, W, A, H] (input memory at step t)
    species: jax.Array      # i32 [T, W, A]
    action: jax.Array       # i8  [T, W, A]
    logp: jax.Array         # f32 [T, W, A]
    value: jax.Array        # f32 [T, W, A]
    reward: jax.Array       # f32 [T, W, A]
    alive: jax.Array        # bool [T, W, A]
    next_alive: jax.Array   # bool [T, W, A]


class RolloutC(NamedTuple):
    """Record-compacted rollout (learner_slots_per_class set): the policy
    forwards run full-width (trajectories are bit-identical to the
    uncompacted trainer — compaction is purely a learner-batch
    optimization), and ONE per-step batched gather (G = W*NS groups,
    learn/pack.py compact_gather) compacts each (world, class)'s alive rows
    into `rows` learner slots. `rec` carries the whole learner payload —
    obs, input memory, action, logp, value — in one [G, rows, C] array so
    the scan emits a single wide ys instead of per-field lane-padded ones.
    The TPU rule behind this shape: every batched gather/scatter op at
    G~8k+ costs ~1 ms regardless of payload width, so the design minimizes
    OP COUNT (1 gather/step), not bytes. Only the GAE inputs stay
    [W, A]-padded (the advantage recursion chains per agent SLOT across
    steps; compacted row r binds to different agents at different t)."""
    rec: jax.Array         # PD  [T, G*rows, C] packed learner rows
                           # (G = W*NS; flattened so C stays the minor dim
                           # — a [T, G, rows, C] ys tempts XLA into a
                           # rows-minor layout that pads 12 -> 128, 10.7x)
    valid: jax.Array       # bool [T, G*rows] (row r < alive count)
    srcrow: jax.Array      # i32 [T, G*rows] global source slot in [0, A)
    dropped: jax.Array     # i32 [T, NS] overflow rows beyond the cap
    value_full: jax.Array  # f32 [T, W, A] full-width values (GAE)
    alive: jax.Array       # bool [T, W, A] pre-step
    reward: jax.Array      # f32 [T, W, A]
    next_alive: jax.Array  # bool [T, W, A]


def _flat_obs(depth, health, pos, semantic, surrounding, dtype=f32):
    """The 69-dim obs layout (util.py:23-28) from compact storage."""
    return jnp.concatenate([
        depth.astype(dtype), health[..., None].astype(dtype),
        pos.astype(dtype), semantic.astype(dtype),
        surrounding.astype(dtype)], axis=-1)


def make_ppo_optimizer(lr: float = 3e-4, max_grad_norm: float = 0.5
                       ) -> optax.GradientTransformation:
    # optax.flatten ravels the ~16 per-tensor Adam/clip states into single
    # vectors: the per-minibatch optimizer step becomes ~10 vector ops
    # instead of ~200 tiny per-tensor ops (each of which pays a fixed
    # XLA-op cost 32x per PPO iteration). Semantics unchanged up to float
    # association in the global norm.
    return optax.flatten(optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(lr, eps=1e-5),
    ))


def make_stacked_ppo_optimizer(num_species: int, lr: float = 3e-4,
                               max_grad_norm: float = 0.5
                               ) -> optax.GradientTransformation:
    """PPO optimizer for a species-STACKED param tree (models/stacked.py).

    Gradient clipping must stay PER SPECIES (the loop path clips each
    species by its own global norm — a joint-norm clip would couple the
    species' updates), so the clip runs on the structured stacked tree and
    only Adam rides optax.flatten. State structure matches
    make_ppo_optimizer's (EmptyState, ScaleByAdamState-on-flat), so
    StackedActorCritic.stack_opt_state converts checkpoints both ways."""
    from madrona_bots_tpu.models.stacked import \
        per_species_clip_by_global_norm
    return optax.chain(
        per_species_clip_by_global_norm(max_grad_norm, num_species),
        optax.flatten(optax.adam(lr, eps=1e-5)),
    )


def make_ppo_trainer(models: Sequence[ActorCritic], cfg: EnvConfig,
                     rollout_len: int = 16, num_minibatches: int = 8,
                     update_epochs: int = 1, clip_eps: float = 0.2,
                     gamma: float = 0.99, gae_lambda: float = 0.95,
                     vf_coef: float = 0.5, ent_coef: float = 0.01,
                     lr: float = 3e-4, max_grad_norm: float = 0.5,
                     use_pallas: bool = False, optimizer=None,
                     compute_dtype=None, learner_slots_per_class=None,
                     decorrelate: bool = True, stacked: bool = False):
    """Returns (ppo_iteration, optimizer).

    ppo_iteration(state, train_states, key) -> (state, train_states, metrics)
    collects `rollout_len` env steps with the current policies and performs
    `update_epochs x num_minibatches` clipped-surrogate updates per species.

    The default schedule is 1 epoch x 8 minibatches (8 Adam steps, ONE data
    pass): the update phase is activation-HBM-bound, so halving its data
    passes vs 2x4 is ~15% end-to-end at 2048 worlds, and the seed-matched
    learning A/B (artifacts/lcurve/ppo_epoch_ab_r5.jsonl) shows tail
    entropy/reward/loss inside the 2x4 seed band. Pass num_minibatches=4,
    update_epochs=2 for the pre-r5 schedule.

    learner_slots_per_class=L (< A/NS) turns on record compaction: the
    rollout still runs full-width policy forwards (trajectories are
    bit-identical to L=None — every alive agent acts; compaction never
    changes behavior), but each step ONE batched gather packs the alive
    rows of every (world, class) group into L learner slots (RolloutC), so
    the update phase trains on ~alive rows instead of the padded capacity.
    Overflow rows beyond L in a crowded group are excluded from the
    LEARNER BATCH only (their transitions go untrained that step, counted
    in species_*_dropped_rows — zero at typical populations).

    stacked=True runs the rollout forwards AND the minibatch update phase
    through ONE species-stacked net (models/stacked.py): every policy
    matmul / loss op / Adam step covers all NS species in one batched op
    instead of NS sequential tiny-op programs. Requires
    learner_slots_per_class < A/NS; `train_states` must be the single
    stacked SpeciesTrainState (learn/a2c.py init_stacked_train_state with
    make_stacked_ppo_optimizer). Per-species math is identical to the loop
    path up to batched-matmul ulps; gradient clipping stays per species
    (per_species_clip_by_global_norm)."""
    if stacked:
        from madrona_bots_tpu.models.stacked import StackedActorCritic
        sac = StackedActorCritic(models)
        assert (learner_slots_per_class is not None
                and learner_slots_per_class
                < cfg.max_agents // cfg.num_species), \
            "stacked PPO requires learner-slot compaction (L < A/NS)"
        if optimizer is None:
            optimizer = make_stacked_ppo_optimizer(cfg.num_species, lr,
                                                   max_grad_norm)
    if optimizer is None:
        optimizer = make_ppo_optimizer(lr, max_grad_norm)
    # Profiling ablation (like MBOTS_STEP_SECTIONS for the systems kernel):
    # MBOTS_PPO_STAGE=rollout|buffers truncates ppo_iteration after that
    # stage, returning a checksum metric instead of training — attribution
    # tool for artifacts/ppo_bisect.py, not a production mode.
    _stage = os.environ.get("MBOTS_PPO_STAGE", "")
    NS = cfg.num_species
    T = rollout_len
    cd = compute_dtype

    def _cast(tree):
        if cd is None:
            return tree
        return jax.tree.map(lambda x: x.astype(cd), tree)

    def _fwd(s, params, obs, mem):
        logits, v, h = models[s].forward(
            _cast(params), obs if cd is None else obs.astype(cd),
            mem if cd is None else mem.astype(cd))
        return logits.astype(f32), v.astype(f32), h.astype(f32)

    # Update-loss forward rematerialization is OFF by default since r3:
    # with learner-row compaction the minibatch activations are only
    # ~100 MB, and recomputing them in the backward measured 21 ms/iter
    # SLOWER than storing them (8192w, slots=12). MBOTS_PPO_REMAT=1
    # restores the r2 behavior (useful if slots/minibatch grow again).
    _fwd_remat = (jax.checkpoint(_fwd, static_argnums=(0,))
                  if os.environ.get("MBOTS_PPO_REMAT", "0") == "1"
                  else _fwd)

    def policy_step(params_list, state: WorldState, key):
        """Sample actions for every species; returns [W, A]-shaped outputs
        plus the [W, A, D] obs the forwards consumed (for record packing).

        Slots are species-class partitioned (SPEC D2b), so each species'
        batch is the contiguous strided view [:, :, s] — each net forwards
        only its own 1/NS of the rows, no sort/gather. Forwards always run
        full-width: compacting them was measured SLOWER on TPU (each
        per-species gather/scatter op costs ~1 ms at W=8192 regardless of
        payload width — 128 extra ops per 16-step rollout — while the
        full-width forwards only cost ~6 ms/step total)."""
        W, A = state.alive.shape
        Asub = A // NS
        Nc = W * Asub
        obs_dtype = f32 if cd is None else cd
        obs = _flat_obs(state.sensor_depth, state.health, state.pos,
                        state.sensor_semantic, state.surrounding, obs_dtype)
        obs4 = obs.reshape(W, Asub, NS, obs.shape[-1])
        H = state.hidden.shape[-1]
        mem4 = state.hidden.reshape(W, Asub, NS, H)
        alive3 = state.alive.reshape(W, Asub, NS)
        sp3 = state.species.reshape(W, Asub, NS)
        a_c, lp_c, v_c, h_c = [], [], [], []
        for s in range(NS):
            m3 = alive3[:, :, s] & (sp3[:, :, s] == s + 1)      # [W, Asub]
            logits, v, h = _fwd(s, params_list[s],
                                obs4[:, :, s].reshape(Nc, obs4.shape[-1]),
                                mem4[:, :, s].reshape(Nc, H))
            a = jax.random.categorical(jax.random.fold_in(key, s), logits)
            lsm = jax.nn.log_softmax(logits, -1)
            lp = jnp.sum(lsm * jax.nn.one_hot(a, lsm.shape[-1],
                                              dtype=lsm.dtype), axis=1)
            mb = m3.reshape(Nc)
            a_c.append(jnp.where(mb, a, 0).reshape(W, Asub))
            lp_c.append(jnp.where(mb, lp, 0.0).reshape(W, Asub))
            v_c.append(jnp.where(mb, v, 0.0).reshape(W, Asub))
            h_c.append((h * mb[:, None].astype(h.dtype)).reshape(W, Asub, H))
        action = jnp.stack(a_c, axis=2).reshape(W, A)
        logp = jnp.stack(lp_c, axis=2).reshape(W, A)
        value = jnp.stack(v_c, axis=2).reshape(W, A)
        new_hidden = jnp.stack(h_c, axis=2).reshape(state.hidden.shape)
        return action, logp, value, new_hidden, obs

    def policy_step_st(params, state: WorldState, key):
        """Stacked policy_step: ONE batched forward for all species.

        Same outputs as policy_step on the per-species views: species s'
        rows forward through its own weight slice (models/stacked.py), and
        sampling uses the identical per-species streams — vmapped
        categorical with keys[s] = fold_in(key, s) draws the same bits as
        the loop's categorical(fold_in(key, s), logits_s)."""
        W, A = state.alive.shape
        Asub = A // NS
        Nc = W * Asub
        obs_dtype = f32 if cd is None else cd
        obs = _flat_obs(state.sensor_depth, state.health, state.pos,
                        state.sensor_semantic, state.surrounding, obs_dtype)
        H = state.hidden.shape[-1]

        def st(x):  # [W, A(, k)] -> species-major [NS, Nc(, k)]
            x4 = x.reshape((W, Asub, NS) + x.shape[2:])
            perm = (2, 0, 1) + tuple(range(3, x4.ndim))
            return x4.transpose(perm).reshape((NS, Nc) + x.shape[2:])

        def unst(x):  # [NS, Nc(, k)] -> [W, A(, k)]
            x4 = x.reshape((NS, W, Asub) + x.shape[2:])
            perm = (1, 2, 0) + tuple(range(3, x4.ndim))
            return x4.transpose(perm).reshape((W, A) + x.shape[2:])

        def _fwd_st(p, o, m):
            lo, v, h = sac.forward(_cast(p), o if cd is None
                                   else o.astype(cd),
                                   m if cd is None else m.astype(cd))
            return lo.astype(f32), v.astype(f32), h.astype(f32)

        logits, v, h = _fwd_st(params, st(obs), st(state.hidden))
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(NS))
        a = jax.vmap(jax.random.categorical)(keys, logits)     # [NS, Nc]
        lsm = jax.nn.log_softmax(logits, -1)
        lp = jnp.sum(lsm * jax.nn.one_hot(a, lsm.shape[-1], dtype=lsm.dtype),
                     axis=-1)
        spec = jnp.arange(1, NS + 1, dtype=state.species.dtype)
        m = st(state.alive & (state.species
                              == jnp.tile(spec, Asub)[None, :]))   # [NS, Nc]
        action = unst(jnp.where(m, a, 0))
        logp = unst(jnp.where(m, lp, 0.0))
        value = unst(jnp.where(m, v, 0.0))
        new_hidden = unst(h * m[..., None].astype(h.dtype)).reshape(
            state.hidden.shape)
        return action, logp, value, new_hidden, obs

    def pack_records(state, obs, mem_in, action, logp, value, rows):
        """ONE batched compaction gather for all (world, class) groups.

        Builds the [G=W*NS, Asub, C] payload in the transport dtype
        (class-major), gathers each group's alive rows into `rows` learner
        slots (compact_gather — exact transport in either mode),
        and returns the RolloutC per-step record fields. In bf16 mode the
        f32 loss scalars (logp, value) ride exact split3 triples; obs and
        memory are recorded exactly as the forwards consumed them."""
        W, A = state.alive.shape
        Asub = A // NS
        G = NS * W
        PD = f32 if cd is None else cd
        H = state.hidden.shape[-1]

        def cm(x):
            """[W, A(, k)] -> class-OUTERMOST [G=NS*W, Asub(, k)].

            Species outermost (g = s*W + w) so the update phase slices
            each species' rows as a CONTIGUOUS view (see a2c.py cm)."""
            x4 = x.reshape((W, Asub, NS) + x.shape[2:])
            perm = (2, 0, 1) + tuple(range(3, x4.ndim))
            return x4.transpose(perm).reshape((G, Asub) + x.shape[2:])

        spec = jnp.arange(1, NS + 1, dtype=state.species.dtype)
        m = cm(state.alive & (state.species
                              == jnp.tile(spec, Asub)[None, :]))   # [G, Asub]
        slot, valid, keep = compact_slots(m, rows)

        # MBOTS_PACK_KERNEL=1: fused Pallas row gather — bit-identical
        # but ~10x slower on v5e than the batched einsum (per-world dot
        # overhead; see ops/row_gather.py). Default OFF.
        if (cd == jnp.bfloat16
                and os.environ.get("MBOTS_PACK_KERNEL", "0") == "1"):
            # Fused Pallas row gather (ops/row_gather.py): skips the
            # [W, A, C] payload concat + class transpose below (~2.5 ms of
            # data movement per rollout step at 8192x128). Bit-identical
            # output (tests/test_ppo.py pack-kernel parity).
            from madrona_bots_tpu.ops.row_gather import (
                compact_fields, kslot_from_class_slots)
            scal = jnp.concatenate(
                [action[..., None].astype(PD)]
                + [p[..., None] for p in split3(logp)]
                + [p[..., None] for p in split3(value)], axis=-1)
            kslot = kslot_from_class_slots(slot, valid, W, NS)
            co, cm_, cs = compact_fields(
                kslot, [obs.astype(PD), mem_in.reshape(W, A, H).astype(PD),
                        scal],
                interpret=jax.default_backend() != "tpu")
            rec = (jnp.concatenate([co, cm_, cs], axis=-1)
                   .reshape(W, NS, rows, -1).transpose(1, 0, 2, 3)
                   .reshape(G, rows, -1))                   # [G, rows, C]
        else:
            # Concatenate in the NATIVE [W, A, .] layout first, then ONE
            # class-major transpose of the whole payload — per-column cm()
            # transposes each pay the fixed wide-op cost (~10 ops/step).
            cols = [obs.astype(PD),
                    mem_in.reshape(W, A, H).astype(PD),
                    action[..., None].astype(PD)]
            if cd is None:
                cols += [logp[..., None], value[..., None]]
            else:
                cols += [p[..., None] for p in split3(logp)]
                cols += [p[..., None] for p in split3(value)]
            payload = cm(jnp.concatenate(cols, axis=-1))    # [G, Asub, C]
            rec = compact_gather(payload, slot, valid)      # [G, rows, C]

        # Global source slot of row r: slot indexes within the class, and
        # class s = g // W occupies slots {i : i % NS == s} (SPEC D2b).
        srcrow = (slot * NS
                  + (jnp.arange(G, dtype=jnp.int32) // W)[:, None])
        m3 = m.reshape(NS, W, Asub)
        dropped = (m3.sum(axis=(1, 2))
                   - keep.reshape(NS, W, Asub).sum(axis=(1, 2)))
        return (rec.reshape(G * rows, -1), valid.reshape(G * rows),
                srcrow.reshape(G * rows), dropped.astype(jnp.int32))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def ppo_iteration(state: WorldState, train_states, key):
        if stacked:
            params_list = train_states.params   # single stacked train state
            _policy = policy_step_st
        else:
            params_list = [ts.params for ts in train_states]
            _policy = policy_step
        W, A = state.alive.shape
        rec_mode = (learner_slots_per_class is not None
                    and learner_slots_per_class < A // NS)

        def env_body(carry, t):
            state, key = carry
            key, k_act = jax.random.split(key)
            mem_in = state.hidden
            action, logp, value, new_hidden, obs = _policy(
                params_list, state, k_act)
            onehot = jax.nn.one_hot(action, NUM_ACTIONS, dtype=jnp.int32)
            if rec_mode:
                rec_r, valid_r, src_r, drop_r = pack_records(
                    state, obs, mem_in, action, logp, value,
                    learner_slots_per_class)
                rec_pre = dict(rec=rec_r, valid=valid_r, srcrow=src_r,
                               dropped=drop_r,
                               value_full=value.reshape(W, A),
                               alive=state.alive)
            else:
                rec_pre = dict(
                    depth=state.sensor_depth,
                    semantic=state.sensor_semantic,
                    health=state.health, pos=state.pos,
                    surrounding=state.surrounding,
                    memory=mem_in.reshape(W, A, -1),
                    species=state.species, alive=state.alive,
                    action=action.reshape(W, A).astype(jnp.int8),
                    logp=logp.reshape(W, A), value=value.reshape(W, A))
            state = state.replace(
                action=onehot.reshape(W, A, NUM_ACTIONS) * state.alive[..., None],
                hidden=new_hidden)
            state = env_mod.sensor_pass(
                env_mod.step_systems(state, cfg, use_pallas), cfg, use_pallas)
            rec = (RolloutC if rec_mode else Rollout)(
                reward=state.reward, next_alive=state.alive, **rec_pre)
            return (state, key), rec

        (state, key), roll = jax.lax.scan(env_body, (state, key),
                                          jnp.arange(T))

        # Bootstrap values at T with the current policy.
        _, _, last_value, _, _ = _policy(params_list, state,
                                         jax.random.fold_in(key, 999))
        last_value = last_value.reshape(W, A)

        # GAE over the scan axis; continuing env (no resets, quirk Q7), agent
        # death = terminal with 0 bootstrap. Always on the [W, A]-padded
        # slot domain: the advantage recursion chains per agent slot.
        value_t = roll.value_full if rec_mode else roll.value

        def gae_body(carry, x):
            r, al, nal, v = x
            gae, next_value = carry
            alive_next = nal & al
            nv = jnp.where(alive_next, next_value, 0.0)
            delta = r + gamma * nv - v
            gae = delta + gamma * gae_lambda * jnp.where(alive_next, gae, 0.0)
            return (gae, v), gae

        (_, _), advantages = jax.lax.scan(
            gae_body, (jnp.zeros((W, A), f32), last_value),
            (roll.reward, roll.alive, roll.next_alive, value_t), reverse=True)
        returns = advantages + value_t

        if _stage == "rollout":
            cks = advantages.sum() + sum(
                jnp.sum(x.astype(f32)) for x in jax.tree.leaves(roll))
            return state, train_states, {
                "env_steps": jnp.float32(T * W), "stage_checksum": cks}

        # Per-class flatten [T, W, A, ...] -> [T*W*Asub, ...] for species s
        # (SPEC D2b: class rows are a contiguous strided view).
        Asub = A // NS
        L = learner_slots_per_class
        rows = Asub if L is None or L >= Asub else L

        def fl(x, s):
            x4 = x.reshape((T, W, Asub, NS) + x.shape[3:])
            return x4[:, :, :, s].reshape((T * W * Asub,) + x.shape[3:])

        B = T * W * rows
        assert B % num_minibatches == 0
        mb = B // num_minibatches

        # Per-iteration row-axis roll: changes each row's stride class
        # between PPO iterations (see module docstring). decorrelate=False
        # restores the round-1 fixed partition (for A/B comparisons).
        roll_off = (jax.random.randint(jax.random.fold_in(key, 777), (), 0, B)
                    if decorrelate else jnp.int32(0))

        def mb_major(x):
            # [B, ...] -> [M, mb, ...]: each minibatch becomes one
            # CONTIGUOUS leading-axis slice. The optimization barrier at
            # the call sites forces XLA to materialize this layout once
            # instead of re-fusing the obs reconstruction + roll + strided
            # pick into every minibatch update (measured 38 -> ~15 ms per
            # 1M-row update on v5e).
            return jnp.swapaxes(
                x.reshape((mb, num_minibatches) + x.shape[1:]), 0, 1)

        def record_update_buffers():
            """Update buffers straight from the record-compacted rollout:
            obs/mem/act/logp/value live in RolloutC.rec columns exactly as
            the policy consumed/produced them — the only re-gather is the
            GAE outputs. Advantages are gathered at the recorded source
            slots by a T-chunked batched one-hot contraction (exact bf16
            split3 transport), and returns = adv + recorded value
            (bit-identical to gathering `returns`: value_full at a valid
            row IS the recorded value)."""
            K = NS * rows
            D = cfg.obs_dim
            H = roll.rec.shape[-1] - D - 1 - (2 if cd is None else 6)

            # [T, G*rows] (class-outermost: g = s*W + w) -> [T, W, K]
            # with k = s*rows + r; one cheap transpose of a 25 MB i32.
            srcK = (roll.srcrow.reshape(T, NS, W, rows)
                    .transpose((0, 2, 1, 3)).reshape(T, W, K))
            # The f32 advantages ride three exact bf16 planes kept as
            # SEPARATE [T, W, A] arrays — a stacked [T, W, A, 3] form pads
            # its minor dim 3 -> 128 (4.3 GB of HLO temp at 8192 worlds).
            # Each plane contracts as a batched one-hot matvec per T-chunk
            # (~1 ms/op floor: fewer, bigger ops); chunked so the
            # [CH*W, K, A] one-hot temp stays ~<=450 MB.
            adv_planes = split3(advantages)                 # 3x [T, W, A]
            CH = next((c for c in (16, 8, 4, 2, 1)
                       if T % c == 0 and c * W * K * A * 2 <= 450e6), 1)

            def adv_chunk(args):
                src_c = args[0]                 # [CH, W, K] i32
                oh = (src_c[..., None]
                      == jnp.arange(A, dtype=src_c.dtype)).astype(bf16)
                return sum(jnp.einsum("gka,ga->gk",
                                      oh.reshape(CH * W, K, A),
                                      p.reshape(CH * W, A),
                                      preferred_element_type=f32)
                           for p in args[1:]).reshape(CH, W, K)

            def chch(x):
                return x.reshape((T // CH, CH) + x.shape[1:])

            # One-hot x bf16 planes accumulate in f32; the 3-plane re-sum
            # is exact (learn/pack.py split3 invariant).
            adv_k = jax.lax.map(
                adv_chunk, tuple(chch(x) for x in (srcK,) + adv_planes)
            ).reshape(T, W, K)

            rec5 = roll.rec.reshape(T, NS, W, rows, -1)
            valid5 = roll.valid.reshape(T, NS, W, rows)
            adv5 = adv_k.reshape(T, W, NS, rows)
            dropped_ns = roll.dropped.sum(axis=0)           # [NS]
            c0 = D + H + 1                                  # scalar cols

            if stacked:
                # Stacked layout: every buffer keeps the species axis so
                # one minibatch slice feeds the batched stacked forward.
                # Same rows, same roll, same stride classes as the
                # per-species path — [M, NS, mb, ...] with
                # out[c, s, i] = x_s[i*M + c], exactly mb_major per species.

                def stk(x):  # [T, NS, W, rows(, k)] -> [NS, B(, k)]
                    perm = (1, 0, 2, 3) + tuple(range(4, x.ndim))
                    return x.transpose(perm).reshape((NS, B) + x.shape[4:])

                def mb_major_st(x):
                    x = jnp.roll(x, roll_off, axis=1)
                    x = x.reshape((NS, mb, num_minibatches) + x.shape[2:])
                    perm = (2, 0, 1) + tuple(range(3, x.ndim))
                    return x.transpose(perm)     # [M, NS, mb, ...]

                if cd is None:
                    lp = stk(rec5[..., c0])
                    vv = stk(rec5[..., c0 + 1])
                else:
                    lp = stk(sum(rec5[..., c0 + i].astype(f32)
                                 for i in range(3)))
                    vv = stk(sum(rec5[..., c0 + 3 + i].astype(f32)
                                 for i in range(3)))
                ad = stk(adv5.transpose(0, 2, 1, 3))
                bufs_st = jax.lax.optimization_barrier(tuple(
                    mb_major_st(x) for x in (
                        stk(rec5[..., 0:D + H]),
                        stk(rec5[..., D + H]).astype(jnp.int32),
                        lp, ad, ad + vv, vv, stk(valid5))))
                return bufs_st, dropped_ns

            bufs, dropped = [], []
            for s in range(NS):
                # Roll + minibatch-major + barrier HERE so each species'
                # buffers materialize immediately and the record tensor
                # is dead before the first minibatch update runs. obs and
                # memory stay FUSED in one [B, D+H] buffer: a separate
                # [B, H=16] memory buffer pads its minor dim 16 -> 128
                # (8x HBM).
                if cd is None:
                    lp = rec5[:, s, :, :, c0].reshape(B)
                    vv = rec5[:, s, :, :, c0 + 1].reshape(B)
                else:
                    lp = sum(rec5[:, s, :, :, c0 + i].astype(f32)
                             for i in range(3)).reshape(B)
                    vv = sum(rec5[:, s, :, :, c0 + 3 + i].astype(f32)
                             for i in range(3)).reshape(B)
                ad = adv5[:, :, s].reshape(B)
                bufs.append(jax.lax.optimization_barrier(tuple(
                    mb_major(jnp.roll(x, roll_off, axis=0)) for x in (
                        rec5[:, s, :, :, 0:D + H].reshape(B, D + H),
                        rec5[:, s, :, :, D + H]
                        .astype(jnp.int32).reshape(B),
                        lp, ad, ad + vv, vv,
                        valid5[:, s].reshape(B)))))
                dropped.append(dropped_ns[s])
            return bufs, dropped

        if rows < Asub:
            sp_bufs, sp_dropped = record_update_buffers()
        else:
            sp_bufs, sp_dropped = None, None

        if _stage == "buffers":
            cks = advantages.sum()
            if sp_bufs is not None:
                flat = (sp_bufs if stacked
                        else [b for bufs in sp_bufs for b in bufs])
                cks = cks + sum(jnp.sum(b.astype(f32)) for b in flat)
            return state, train_states, {
                "env_steps": jnp.float32(T * W), "stage_checksum": cks}

        if stacked:
            # ---- ONE update scan over the species-stacked params ----
            bufs_st, dropped_ns = sp_bufs, sp_dropped
            ts = train_states
            D_obs = cfg.obs_dim

            def _head_st(logits, v, a, lp_old, adv_n, ret, vold, w):
                """Per-species clipped-surrogate sums [NS] (see _head —
                same formulas with a leading species axis; remat unit for
                the same lane-padding reason)."""
                lsm_new = jax.nn.log_softmax(logits, -1)
                logp_new = jnp.sum(
                    lsm_new * jax.nn.one_hot(a, lsm_new.shape[-1],
                                             dtype=lsm_new.dtype), axis=-1)
                ratio = jnp.exp(logp_new - lp_old)
                pg = -jnp.minimum(
                    ratio * adv_n,
                    jnp.clip(ratio, 1 - clip_eps, 1 + clip_eps) * adv_n)
                v_clip = vold + jnp.clip(v - vold, -clip_eps, clip_eps)
                v_loss = 0.5 * jnp.maximum((v - ret) ** 2,
                                           (v_clip - ret) ** 2)
                probs = jax.nn.softmax(logits, -1)
                ent = -jnp.sum(probs * jnp.log(jnp.clip(probs, 1e-12)), -1)
                return (jnp.sum(pg * w, axis=1), jnp.sum(v_loss * w, axis=1),
                        jnp.sum(ent * w, axis=1))

            if os.environ.get("MBOTS_PPO_HEAD_REMAT", "1") == "1":
                _head_st = jax.checkpoint(_head_st)

            def _fwd_st_u(params, o, m):
                lo, v, h = sac.forward(_cast(params),
                                       o if cd is None else o.astype(cd),
                                       m if cd is None else m.astype(cd))
                return lo.astype(f32), v.astype(f32), h.astype(f32)

            _fwd_st_remat = (jax.checkpoint(_fwd_st_u)
                             if os.environ.get("MBOTS_PPO_REMAT", "0") == "1"
                             else _fwd_st_u)

            def loss_fn(params, picked):
                om, a, lp_old, adv, ret, vold, msk = picked   # [NS, mb, ...]
                o, m = om[..., :D_obs], om[..., D_obs:]
                w = msk.astype(f32)
                denom = jnp.maximum(w.sum(axis=1), 1.0)       # [NS]
                # advantage normalization per species minibatch (the same
                # per-species statistics the loop path computes)
                mu = jnp.sum(adv * w, axis=1) / denom
                var = jnp.sum((adv - mu[:, None]) ** 2 * w, axis=1) / denom
                adv_n = (adv - mu[:, None]) * jax.lax.rsqrt(
                    var + 1e-8)[:, None]
                logits, v, _ = _fwd_st_remat(params, o, m)
                pg_s, vl_s, ent_s = _head_st(logits, v, a, lp_old, adv_n,
                                             ret, vold, w)
                loss_s = (pg_s + vf_coef * vl_s - ent_coef * ent_s) / denom
                # species param slices are disjoint: the summed loss yields
                # exactly each species' own gradient in its slice
                return jnp.sum(loss_s), (loss_s, pg_s / denom,
                                         vl_s / denom, ent_s / denom)

            def epoch_body(ts, e):
                def mb_body(ts, i):
                    cls = (i + e) % num_minibatches if decorrelate else i
                    picked = tuple(
                        jax.lax.dynamic_index_in_dim(x, cls, axis=0,
                                                     keepdims=False)
                        for x in bufs_st)
                    (_, aux), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(ts.params, picked)
                    updates, opt = optimizer.update(grads, ts.opt_state,
                                                    ts.params)
                    return SpeciesTrainState(
                        optax.apply_updates(ts.params, updates), opt), aux

                return jax.lax.scan(mb_body, ts, jnp.arange(num_minibatches))

            ts, (loss_s, pg_s, vl_s, ent_s) = jax.lax.scan(
                epoch_body, ts, jnp.arange(update_epochs))  # [E, M, NS]

            # Full-alive-set per-species reward/count (elementwise masked
            # sums, NOT einsums — TPU matmul precision hazard).
            al4 = roll.alive.reshape(T, W, Asub, NS)
            rw4 = roll.reward.reshape(T, W, Asub, NS)
            count_ns = jnp.sum(al4.astype(f32), axis=(0, 1, 2))
            reward_ns = jnp.sum(rw4 * al4.astype(f32), axis=(0, 1, 2))
            per_species = {
                "loss": loss_s.mean(axis=(0, 1)),
                "pg_loss": pg_s.mean(axis=(0, 1)),
                "v_loss": vl_s.mean(axis=(0, 1)),
                "entropy": ent_s.mean(axis=(0, 1)),
                "count": count_ns / T,
                "reward": reward_ns / T,
                "dropped_rows": dropped_ns,
            }
            metrics = {f"species_{s + 1}_{k}": v[s]
                       for k, v in per_species.items() for s in range(NS)}
            metrics["env_steps"] = jnp.float32(T * W)
            return state, ts, metrics

        def update_species(s, ts):
            if rec_mode:
                # SPEC D2b: an alive slot i always carries species
                # (i % NS) + 1, so the class-strided alive view IS the
                # species mask (RolloutC stores no species field).
                mask_full = fl(roll.alive, s)
            else:
                mask_full = fl(roll.alive, s) & (fl(roll.species, s) == s + 1)
            reward_total = jnp.sum(fl(roll.reward, s) * mask_full)
            count_total = mask_full.sum()

            if rows < Asub:
                # Already rolled, minibatch-major, and barrier'd in
                # record_update_buffers.
                bufs = sp_bufs[s]
                dropped = sp_dropped[s]
            else:
                obs_all = _flat_obs(
                    fl(roll.depth, s), fl(roll.health, s), fl(roll.pos, s),
                    fl(roll.semantic, s), fl(roll.surrounding, s),
                    f32 if cd is None else cd)
                mem_b = fl(roll.memory, s)
                act_b = fl(roll.action, s).astype(jnp.int32)
                logp_b = fl(roll.logp, s)
                adv_b = fl(advantages, s)
                ret_b = fl(returns, s)
                val_b = fl(roll.value, s)
                mask_sp = mask_full
                dropped = jnp.int32(0)
                om = jnp.concatenate(
                    [obs_all, mem_b.astype(obs_all.dtype)], axis=-1)
                bufs = jax.lax.optimization_barrier(tuple(
                    mb_major(jnp.roll(x, roll_off, axis=0))
                    for x in (om, act_b, logp_b,
                              adv_b, ret_b, val_b, mask_sp)))

            D_obs = cfg.obs_dim

            def _head(logits, v, a, lp_old, adv_n, ret, vold, w):
                """Clipped-surrogate pieces from the net outputs. Kept as a
                remat unit: its [mb, 6] intermediates (log-softmax, one-hot
                product, softmax, entropy terms) each pad 6 -> 128 lanes
                when saved for the backward (~200 MB apiece at mb~400k);
                recomputing them costs a few elementwise ops."""
                lsm_new = jax.nn.log_softmax(logits, -1)
                logp_new = jnp.sum(
                    lsm_new * jax.nn.one_hot(a, lsm_new.shape[-1],
                                             dtype=lsm_new.dtype), axis=1)
                ratio = jnp.exp(logp_new - lp_old)
                pg = -jnp.minimum(
                    ratio * adv_n,
                    jnp.clip(ratio, 1 - clip_eps, 1 + clip_eps) * adv_n)
                v_clip = vold + jnp.clip(v - vold, -clip_eps, clip_eps)
                v_loss = 0.5 * jnp.maximum((v - ret) ** 2,
                                           (v_clip - ret) ** 2)
                probs = jax.nn.softmax(logits, -1)
                ent = -jnp.sum(probs * jnp.log(jnp.clip(probs, 1e-12)), -1)
                return (jnp.sum(pg * w), jnp.sum(v_loss * w),
                        jnp.sum(ent * w))

            if os.environ.get("MBOTS_PPO_HEAD_REMAT", "1") == "1":
                _head = jax.checkpoint(_head)

            def loss_fn(params, picked):
                om, a, lp_old, adv, ret, vold, msk = picked
                o, m = om[:, :D_obs], om[:, D_obs:]
                w = msk.astype(f32)
                denom = jnp.maximum(w.sum(), 1.0)
                # normalize advantages over the species minibatch
                mu = jnp.sum(adv * w) / denom
                var = jnp.sum((adv - mu) ** 2 * w) / denom
                adv_n = (adv - mu) * jax.lax.rsqrt(var + 1e-8)

                logits, v, _ = _fwd_remat(s, params, o, m)
                pg_s, vl_s, ent_s = _head(logits, v, a, lp_old, adv_n,
                                          ret, vold, w)
                loss = (pg_s + vf_coef * vl_s - ent_coef * ent_s) / denom
                return loss, (pg_s / denom, vl_s / denom, ent_s / denom)

            def epoch_body(ts, e):
                def mb_body(ts, i):
                    # Epoch e visits stride class (i + e) % M.
                    cls = (i + e) % num_minibatches if decorrelate else i
                    picked = tuple(
                        jax.lax.dynamic_index_in_dim(x, cls, axis=0,
                                                     keepdims=False)
                        for x in bufs)
                    (loss, aux), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(ts.params, picked)
                    updates, opt = optimizer.update(grads, ts.opt_state,
                                                    ts.params)
                    return SpeciesTrainState(
                        optax.apply_updates(ts.params, updates), opt), (loss, aux)

                ts, losses = jax.lax.scan(mb_body, ts,
                                          jnp.arange(num_minibatches))
                return ts, losses

            ts, losses = jax.lax.scan(epoch_body, ts,
                                      jnp.arange(update_epochs))
            loss, (pg, vl, ent) = losses
            return ts, {
                "loss": loss.mean(), "pg_loss": pg.mean(),
                "v_loss": vl.mean(), "entropy": ent.mean(),
                "count": count_total / T,
                "reward": reward_total / T,
                "dropped_rows": dropped,
            }

        new_ts = []
        metrics = {}
        for s in range(NS):
            ts, m = update_species(s, train_states[s])
            new_ts.append(ts)
            for kk, v in m.items():
                metrics[f"species_{s + 1}_{kk}"] = v
        metrics["env_steps"] = jnp.float32(T * W)
        return state, tuple(new_ts), metrics

    return ppo_iteration, optimizer
