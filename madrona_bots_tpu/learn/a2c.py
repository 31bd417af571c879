"""Per-species TD(0) advantage actor-critic — one fused on-device train tick.

Mirrors `train_step` (reference: learn/training_loop.py:29-137) but stays
entirely on device: sim step, per-species forward/sample/loss/Adam update,
action & memory write-back, and the obs shift compose into ONE jitted
function. The reference's species-major tensor slicing (cumsum of
species_count_tensor, training_loop.py:43-45) becomes per-species masks over
the padded [W*A] batch — no sort, no host readbacks.

Sequencing note (deviation vs the reference's trap, SURVEY §5 quirk 7): the
reference calls shift_observations() INSIDE the species loop, so later
species see earlier species' freshly written actions/memories already shifted
into the Prev buffers. We shift ONCE after all species — the semantics
training_loop.py evidently intends (prev tensors = previous tick).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from madrona_bots_tpu.config import NUM_ACTIONS, EnvConfig
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.state import WorldState
from madrona_bots_tpu.learn.obs import construct_obs, obs_field_cols
from madrona_bots_tpu.learn.pack import (compact_gather, compact_slots,
                                          expand_scatter, split3)
from madrona_bots_tpu.models.actor_critic import ActorCritic, compute_loss

f32 = jnp.float32
bf16 = jnp.bfloat16


class SpeciesTrainState(NamedTuple):
    params: Any
    opt_state: Any


def make_optimizer(lr: float = 3e-4) -> optax.GradientTransformation:
    """Adam, reference defaults (training_loop.py:197, torch.optim.Adam).

    optax.flatten turns the per-tensor moment updates (~130 tiny XLA ops
    across 4 species per tick) into a handful of single-vector ops —
    identical update values, per-element."""
    return optax.flatten(optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8))


def init_train_states(models: Sequence[ActorCritic], key: jax.Array,
                      optimizer: optax.GradientTransformation):
    states = []
    for i, m in enumerate(models):
        params = m.init(jax.random.fold_in(key, i))
        states.append(SpeciesTrainState(params, optimizer.init(params)))
    return tuple(states)


def _species_update(model: ActorCritic, optimizer, ts: SpeciesTrainState,
                    obs_cur, obs_prev, mem_cur, mem_prev, prev_actions,
                    rewards, mask, key, gamma: float, proper_log_probs: bool,
                    compute_dtype=None, loss_mask=None):
    """One species' gradient step. All inputs flattened [N=W*A, ...] with a
    [N] f32 mask selecting this species' alive agents; `loss_mask` (default
    mask) additionally excludes agents with no valid previous transition —
    slots born/respawned THIS tick have zeroed prev twins and would otherwise
    inject fictitious (zero-obs, action-0) transitions into the gradient
    (the reference trains on uninitialized prev rows there; SPEC deviation
    D9). With
    compute_dtype (e.g. bf16) forwards run in reduced precision against f32
    master params (mixed-precision; grads/optimizer stay f32)."""
    if loss_mask is None:
        loss_mask = mask

    def _maybe_cast(tree):
        if compute_dtype is None:
            return tree
        return jax.tree.map(lambda x: x.astype(compute_dtype), tree)

    def _fwd(params, obs, mem):
        logits, v, h = model.forward(_maybe_cast(params), obs,
                                     mem if compute_dtype is None
                                     else mem.astype(compute_dtype))
        return logits.astype(f32), v.astype(f32), h.astype(f32)

    # Current forward: action distribution + V(s') + new memory
    # (training_loop.py:59-60).
    logits, v_new, new_mem = _fwd(ts.params, obs_cur, mem_cur)
    actions = jax.random.categorical(key, logits, axis=-1)

    # Remat the in-loss forward: recomputing the ~6 [N, hidden] activation
    # tensors in the backward beats storing them to HBM (same rationale as
    # ppo.py _fwd_remat).
    import os as _os
    _fwd_remat = (jax.checkpoint(_fwd)
                  if _os.environ.get("MBOTS_A2C_REMAT", "1") == "1" else _fwd)

    def loss_fn(params):
        # Prev forward: pi(a_prev | s_prev), V(s_prev) (training_loop.py:87-94).
        logits_p, v_prev, _ = _fwd_remat(params, obs_prev, mem_prev)
        if proper_log_probs:
            logp_all = jax.nn.log_softmax(logits_p, axis=-1)
        else:
            # Reference indexes RAW actor outputs as "log probs"
            # (training_loop.py:94 with models.py:169 logits).
            logp_all = logits_p
        # One-hot select (exact; [N, 6] dynamic gathers serialize on TPU).
        logp = jnp.sum(
            logp_all * jax.nn.one_hot(prev_actions, logp_all.shape[-1],
                                      dtype=logp_all.dtype), axis=1)
        actor_loss, critic_loss = compute_loss(
            logp, rewards, v_prev, jax.lax.stop_gradient(v_new),
            gamma=gamma, mask=loss_mask)
        return actor_loss + critic_loss, (actor_loss, critic_loss)

    (total, (actor_loss, critic_loss)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(ts.params)
    updates, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
    new_params = optax.apply_updates(ts.params, updates)

    denom = jnp.maximum(mask.sum(), 1.0)
    logp_soft = jax.nn.log_softmax(logits, axis=-1)
    logp_taken = jnp.sum(
        logp_soft * jax.nn.one_hot(actions, logp_soft.shape[-1],
                                   dtype=logp_soft.dtype), axis=1)
    probs = jax.nn.softmax(logits, axis=-1)
    entropy = -jnp.sum(probs * jnp.log(jnp.clip(probs, 1e-12)), axis=-1)
    metrics = {
        "actor_loss": actor_loss,
        "critic_loss": critic_loss,
        "total_loss": total,
        "count": mask.sum(),
        "reward": jnp.sum(rewards * mask),
        "avg_action_prob": jnp.exp(jnp.sum(logp_taken * mask) / denom),
        "avg_action_entropy": jnp.sum(entropy * mask) / denom,
    }
    return SpeciesTrainState(new_params, new_opt), actions, new_mem, metrics


def init_stacked_train_state(models: Sequence[ActorCritic], key: jax.Array,
                             optimizer) -> SpeciesTrainState:
    """ONE SpeciesTrainState whose params/opt_state carry a leading [NS]
    species axis (models/stacked.py layout). Params are the same values
    init_train_states produces, stacked; Adam is elementwise, so the
    stacked optimizer trajectory equals the per-species one."""
    from madrona_bots_tpu.models.stacked import StackedActorCritic
    sac = StackedActorCritic(models)
    params = [m.init(jax.random.fold_in(key, i))
              for i, m in enumerate(models)]
    sp = sac.stack_params(params)
    return SpeciesTrainState(sp, optimizer.init(sp))


def make_train_tick(models: Sequence[ActorCritic], cfg: EnvConfig,
                    lr: float = 3e-4, gamma: float = 1.0,
                    proper_log_probs: bool = False,
                    quirk_compat: bool = False, use_pallas: bool = False,
                    compute_dtype=None, learner_slots_per_class=None,
                    stacked: bool = False,
                    quirk_inloop_shift: bool = False):
    """Build the fused jitted train tick.

    Returns (tick, optimizer) where
      tick(state, train_states, key) -> (state, train_states, metrics)
    runs: sim step -> 4 species updates -> action/memory write-back -> shift.

    learner_slots_per_class=L compacts each world's alive class rows into L
    learner slots before the update (per-world one-hot contraction — the
    same alive-rows-only batch the reference's species sort produces, so it
    is MORE faithful than the padded batch, not less). Overflow agents
    beyond L in a crowded world are dropped for that tick (null action,
    zero memory; counted in species_*_dropped_rows — zero at typical
    populations). None = train on all padded slots.

    stacked=True runs the NS species updates as ONE batched update over a
    species-stacked param tree (models/stacked.py): every matmul/optimizer
    op covers all species at once — ~NS x fewer XLA ops per tick at
    identical per-species math (forwards equal to a few float ulps; Adam is
    elementwise so the optimizer is exact given equal grads). Requires
    learner_slots_per_class; `train_states` must be the single
    init_stacked_train_state(...) state instead of the per-species tuple.

    quirk_inloop_shift=True (SPEC quirk Q8) reproduces the reference's
    shift ORDERING: training_loop.py:135-137 calls shift_observations()
    at the end of EVERY species iteration (before that species' action/
    memory writes), so each species' "prev" reads are the post-shift
    buffers. Net effect, derived in tests/test_quirks.py by sequencing the
    real ordering: mem_prev == mem_cur for every species (each species'
    prev-hidden rows were overwritten with its current memory by an earlier
    shift), obs_prev == obs_cur for species 2..NS (species 1 reads the true
    previous tick), the D9 fresh-slot loss mask is OFF (the reference
    trains all its alive rows), and the end-of-tick prev action/hidden
    buffers interleave: species 1..NS-1 carry their NEW writes (the last
    shift ran after them), species NS its old ones. Loop path only."""
    optimizer = make_optimizer(lr)
    num_species = cfg.num_species
    assert len(models) == num_species
    Lcap = learner_slots_per_class
    if stacked:
        from madrona_bots_tpu.models.stacked import StackedActorCritic
        sac = StackedActorCritic(models)
        # The stacked branch reads the compaction block's grec4/valid3
        # outputs, which only exist when Lcap < Asub — catch a too-large cap
        # here instead of an UnboundLocalError at trace time.
        assert (Lcap is not None
                and Lcap < cfg.max_agents // cfg.num_species), \
            "stacked tick requires learner-slot compaction (Lcap < A/NS)"
    if quirk_inloop_shift:
        assert not stacked and (Lcap is None
                                or Lcap >= cfg.max_agents // cfg.num_species), \
            "quirk_inloop_shift pins the reference ordering on the plain " \
            "per-species loop path only"

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def tick(state: WorldState, train_states, key):
        state = env_mod.sensor_pass(
            env_mod.step_systems(state, cfg, use_pallas), cfg, use_pallas)

        W, A = state.alive.shape
        # Species-class slot partitioning (SPEC D2b): slot i belongs to
        # species (i % NS) + 1, so each species' batch is a contiguous
        # strided view — no sort/gather, and each net forwards only its own
        # 1/NS of the rows (the reference achieves the same via a global
        # species sort, sim.cpp:674-685).
        NS = num_species
        Asub = A // NS
        Nc = W * Asub
        obs_dtype = f32 if compute_dtype is None else compute_dtype
        D = cfg.obs_dim
        compacting = (Lcap is not None and Lcap < Asub)
        if not compacting:
            obs_cur = construct_obs(state, cfg, prev=False,
                                    quirk_compat=quirk_compat,
                                    dtype=obs_dtype)
            obs_prev = construct_obs(state, cfg, prev=True,
                                     quirk_compat=quirk_compat,
                                     dtype=obs_dtype)
            obs_cur4 = obs_cur.reshape(W, Asub, NS, D)
            obs_prev4 = obs_prev.reshape(W, Asub, NS, D)

        H = state.hidden.shape[-1]
        mem4 = state.hidden.reshape(W, Asub, NS, H)
        mem_prev4 = state.prev_hidden.reshape(W, Asub, NS, H)
        rewards3 = state.reward.reshape(W, Asub, NS)
        # a_prev: the one-hot written into the action buffer last tick
        # (training_loop.py:93).
        prev_act3 = jnp.argmax(state.action, axis=-1).reshape(W, Asub, NS)
        alive3 = state.alive.reshape(W, Asub, NS)
        species3 = state.species.reshape(W, Asub, NS)

        rows = Asub if Lcap is None or Lcap >= Asub else Lcap

        if compacting:
            # ONE batched compaction gather for all species at once,
            # class-OUTERMOST groups (G = NS*W, g = s*W + w): measured the
            # fastest formulation on v5e — beats both the per-species r2
            # einsum pair (8 ops/tick) and a full-slot [W, K, A] one-hot
            # (the [G, rows, Asub] one-hot einsum is 32768 tiny matmuls
            # that tile better than 8192 [48, 128] ones; 269.5k vs 251k
            # A2C steps/s). The obs FIELD columns splice into the payload
            # directly — the [W, A, D] obs tensors are never built.
            # Exactness: bf16 mode's payload columns are bf16-exact by
            # construction (obs/memory cast FIRST — the same value the
            # uncompacted forward consumes; f32 rewards ride split3
            # triples); f32 mode uses exact data movement
            # (learn/pack.py compact_gather).
            PD = obs_dtype
            G = NS * W

            def cmaj(x):
                """[W, A(, k)] -> class-outermost [G, Asub(, k)]."""
                x4 = x.reshape((W, Asub, NS) + x.shape[2:])
                perm = (2, 0, 1) + tuple(range(3, x4.ndim))
                return x4.transpose(perm).reshape((G, Asub) + x.shape[2:])

            spec_tile = jnp.tile(
                jnp.arange(1, NS + 1, dtype=state.species.dtype), Asub)
            m_full = state.alive & (state.species == spec_tile[None, :])
            lm_full = m_full & (state.prev_species == spec_tile[None, :])
            m = cmaj(m_full)                                # [G, Asub]
            slot, valid_g, keep = compact_slots(m, rows)

            # MBOTS_PACK_KERNEL=1 swaps in the fused Pallas row
            # gather (ops/row_gather.py). Bit-identical but measured ~5x
            # SLOWER on v5e (57k tiny per-world MXU dots pay ~0.4us each
            # vs ONE huge batched einsum) — kept as an A/B'd experiment,
            # default OFF; see ops/row_gather.py docstring.
            use_pack_kernel = (
                compute_dtype == jnp.bfloat16
                and os.environ.get("MBOTS_PACK_KERNEL", "0") == "1")
            if use_pack_kernel:
                # Fused Pallas row gather (ops/row_gather.py): sensor bytes
                # stay u8/i8 in HBM and every field compacts in ONE kernel
                # — the [W, A, ~170]-column bf16 payload concat + class
                # transpose below cost ~5 ms/tick of pure data movement at
                # 8192x128. Same bf16 values bit-for-bit (the kernel does
                # the identical one-hot contraction in-VMEM;
                # tests/test_row_gather.py + test_learn.py).
                from madrona_bots_tpu.ops.row_gather import (
                    compact_fields, kslot_from_class_slots)
                if quirk_compat:
                    # Q1: depth block = semantic bytes REINTERPRETED as u8
                    # (-1 -> 255), exactly as obs_field_cols does.
                    d_cur = state.sensor_semantic.astype(jnp.uint8)
                    d_prev = state.prev_sensor_semantic.astype(jnp.uint8)
                    hcol = lambda h: jax.lax.bitcast_convert_type(
                        h[..., None].astype(jnp.int32), f32).astype(PD)
                else:
                    d_cur = state.sensor_depth
                    d_prev = state.prev_sensor_depth
                    hcol = lambda h: h[..., None].astype(PD)
                scal = jnp.concatenate([
                    hcol(state.health), state.pos.astype(PD),
                    state.surrounding.astype(PD),
                    hcol(state.prev_health), state.prev_pos.astype(PD),
                    state.prev_surrounding.astype(PD),
                    lm_full[..., None].astype(PD),
                    jnp.argmax(state.action, axis=-1)[..., None].astype(PD),
                    *(p[..., None] for p in split3(state.reward)),
                ], axis=-1)                             # [W, A, 15]
                kslot = kslot_from_class_slots(slot, valid_g, W, NS)
                interp = jax.default_backend() != "tpu"
                cd_, cs_, pd_, ps_, csc, chid, cphid = compact_fields(
                    kslot,
                    [d_cur, state.sensor_semantic, d_prev,
                     state.prev_sensor_semantic, scal,
                     state.hidden.reshape(W, A, H).astype(PD),
                     state.prev_hidden.reshape(W, A, H).astype(PD)],
                    interpret=interp)
                # Reassemble the util.py:23-28 obs layout at [W, K] scale.
                obs_c = jnp.concatenate(
                    [cd_, csc[..., 0:3], cs_, csc[..., 3:5]], axis=-1)
                obs_p = jnp.concatenate(
                    [pd_, csc[..., 5:8], ps_, csc[..., 8:10]], axis=-1)
                grec = jnp.concatenate(
                    [obs_c, obs_p, chid, cphid, csc[..., 10:]], axis=-1)
                grec4 = (grec.reshape(W, NS, rows, grec.shape[-1])
                         .transpose(1, 0, 2, 3))
            else:
                cols = obs_field_cols(state, cfg, prev=False,
                                      quirk_compat=quirk_compat, dtype=PD)
                cols += obs_field_cols(state, cfg, prev=True,
                                       quirk_compat=quirk_compat, dtype=PD)
                cols += [state.hidden.reshape(W, A, H).astype(PD),
                         state.prev_hidden.reshape(W, A, H).astype(PD),
                         lm_full[..., None].astype(PD),
                         jnp.argmax(state.action,
                                    axis=-1)[..., None].astype(PD)]
                if compute_dtype is None:
                    cols.append(state.reward[..., None])
                else:
                    cols += [p[..., None] for p in split3(state.reward)]
                grec = compact_gather(cmaj(jnp.concatenate(cols, axis=-1)),
                                      slot, valid_g)
                grec4 = grec.reshape(NS, W, rows, grec.shape[-1])
            valid3 = valid_g.reshape(NS, W, rows)
            m_sums = m.reshape(NS, W, Asub).sum(axis=(1, 2))
            k_sums = keep.reshape(NS, W, Asub).sum(axis=(1, 2))
            c0 = 2 * D + 2 * H                              # scalar cols

        if stacked:
            # ---- ONE batched update over the species-stacked params ----
            # (models/stacked.py). grec4 is already class-outermost
            # [NS, W, rows, C]; every op below covers all species at once.
            B = W * rows
            g = grec4.reshape(NS, B, grec4.shape[-1])
            obs_cur_s = g[..., 0:D]
            obs_prev_s = g[..., D:2 * D]
            mem_s = g[..., 2 * D:2 * D + H]
            mem_prev_s = g[..., 2 * D + H:c0]
            vmask = valid3.reshape(NS, B).astype(f32)
            loss_mask_s = g[..., c0].astype(f32) * vmask
            if compute_dtype is None:
                rew = g[..., c0 + 2]
            else:
                rew = sum(g[..., c0 + 2 + i].astype(f32) for i in range(3))
            prev_act = g[..., c0 + 1].astype(jnp.int32)
            ts = train_states            # single stacked SpeciesTrainState

            def _maybe_cast(tree):
                if compute_dtype is None:
                    return tree
                return jax.tree.map(lambda x: x.astype(compute_dtype), tree)

            def _fwd(params, obs, mem):
                lo, v, h = sac.forward(
                    _maybe_cast(params), obs,
                    mem if compute_dtype is None
                    else mem.astype(compute_dtype))
                return lo.astype(f32), v.astype(f32), h.astype(f32)

            logits, v_new, new_mem = _fwd(ts.params, obs_cur_s, mem_s)
            # Identical per-species sampling streams: species s draws with
            # fold_in(key, s), as the per-species loop does.
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(NS))
            actions = jax.vmap(jax.random.categorical)(keys, logits)

            _fwd_remat = (jax.checkpoint(_fwd)
                          if os.environ.get("MBOTS_A2C_REMAT", "1") == "1"
                          else _fwd)

            def loss_fn(params):
                logits_p, v_prev, _ = _fwd_remat(params, obs_prev_s,
                                                 mem_prev_s)
                if proper_log_probs:
                    logp_all = jax.nn.log_softmax(logits_p, axis=-1)
                else:
                    logp_all = logits_p    # reference raw-logit quirk
                logp = jnp.sum(
                    logp_all * jax.nn.one_hot(prev_act, logp_all.shape[-1],
                                              dtype=logp_all.dtype), axis=-1)
                # compute_loss (models/actor_critic.py), batched over the
                # species axis with per-species sums.
                adv = (rew + gamma * jax.lax.stop_gradient(v_new)
                       - jax.lax.stop_gradient(v_prev))
                actor_s = -jnp.sum(logp * adv * loss_mask_s, axis=1)
                diff = rew - v_prev
                huber = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff,
                                  jnp.abs(diff) - 0.5)
                denom = jnp.maximum(jnp.sum(loss_mask_s, axis=1), 1.0)
                critic_s = jnp.sum(huber * loss_mask_s, axis=1) / denom
                return jnp.sum(actor_s + critic_s), (actor_s, critic_s)

            (_, (actor_s, critic_s)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(ts.params)
            updates, new_opt = optimizer.update(grads, ts.opt_state,
                                                ts.params)
            new_tstate = SpeciesTrainState(
                optax.apply_updates(ts.params, updates), new_opt)

            # Per-species metric series (same names/values as the loop).
            denom_v = jnp.maximum(vmask.sum(axis=1), 1.0)
            logp_soft = jax.nn.log_softmax(logits, axis=-1)
            oh_act = jax.nn.one_hot(actions, NUM_ACTIONS,
                                    dtype=logp_soft.dtype)
            logp_taken = jnp.sum(logp_soft * oh_act, axis=-1)
            probs = jax.nn.softmax(logits, axis=-1)
            entropy = -jnp.sum(probs * jnp.log(jnp.clip(probs, 1e-12)),
                               axis=-1)
            # Elementwise masked sums, NOT einsums: an einsum carrying the
            # f32 rewards/health payloads would ride TPU's default bf16
            # matmul path and silently diverge from the loop path's exact
            # sums (the CLAUDE.md precision hazard; CPU tests can't see it).
            # Masking in the native [W, A] slot layout (m_full) avoids any
            # class-major transpose — the per-species split is the free
            # strided reshape (D2b).
            mf = m_full.astype(f32)                         # [W, A]
            count_s = m_sums.astype(f32)
            denom_c = jnp.maximum(count_s, 1.0)
            rew_full = jnp.sum((state.reward * mf).reshape(W, Asub, NS),
                               axis=(0, 1))
            avg_health = jnp.sum(
                (state.health.astype(f32) * mf).reshape(W, Asub, NS),
                axis=(0, 1)) / denom_c
            hist = jnp.einsum("sbk,sb->sk", oh_act.astype(f32), vmask)
            per_species = {
                "actor_loss": actor_s,
                "critic_loss": critic_s,
                "total_loss": actor_s + critic_s,
                "count": count_s,
                "reward": rew_full,
                "avg_action_prob": jnp.exp(
                    jnp.sum(logp_taken * vmask, axis=1) / denom_v),
                "avg_action_entropy": jnp.sum(entropy * vmask,
                                              axis=1) / denom_v,
                "dropped_rows": m_sums - k_sums,
                "avg_health": avg_health,
                "count_per_world": count_s / W,
                "popular_action": jnp.argmax(hist, axis=1).astype(f32),
            }
            metrics = {f"species_{s + 1}_{k}": v[s]
                       for k, v in per_species.items()
                       for s in range(num_species)}

            # Batched write-back (same expansion as the loop path).
            sdt = bf16 if compute_dtype == jnp.bfloat16 else f32
            src = jnp.concatenate(
                [jax.nn.one_hot(actions, NUM_ACTIONS, dtype=f32)
                 * vmask[..., None],
                 new_mem * vmask[..., None]], axis=-1).reshape(
                     G, rows, NUM_ACTIONS + H).astype(sdt)
            out = expand_scatter(src, slot, valid_g, Asub)
            out4 = out.reshape(NS, W, Asub, NUM_ACTIONS + H).transpose(
                (1, 2, 0, 3))
            state = env_mod.shift_observations_impl(state, cfg)
            state = state.replace(
                action=out4[..., :NUM_ACTIONS].astype(jnp.int32).reshape(
                    W, A, NUM_ACTIONS),
                hidden=out4[..., NUM_ACTIONS:].reshape(
                    state.hidden.shape).astype(state.hidden.dtype))
            return state, new_tstate, metrics

        action_cols, hidden_cols = [], []
        mem_rows, onehot_rows = [], []
        new_tstates = []
        metrics: Dict[str, jax.Array] = {}
        for s in range(num_species):
            mask3 = alive3[:, :, s] & (species3[:, :, s] == s + 1)  # [W, Asub]
            mask_full = mask3.astype(f32).reshape(Nc)
            prev_sp3 = state.prev_species.reshape(W, Asub, NS)
            lm3 = mask3 & (prev_sp3[:, :, s] == s + 1)

            if rows < Asub:
                g = grec4[s]                    # [W, rows, C], contiguous
                vmask = valid3[s].reshape(W * rows).astype(f32)
                mask = vmask
                loss_mask = (g[..., c0].astype(f32).reshape(W * rows)
                             * vmask)
                if compute_dtype is None:
                    rew = g[..., c0 + 2].reshape(W * rows)
                else:
                    rew = sum(g[..., c0 + 2 + i].astype(f32)
                              for i in range(3)).reshape(W * rows)
                up = dict(
                    obs_cur=g[..., 0:D].reshape(W * rows, D),
                    obs_prev=g[..., D:2 * D].reshape(W * rows, D),
                    mem=g[..., 2 * D:2 * D + H].reshape(W * rows, H),
                    mem_prev=g[..., 2 * D + H:c0].reshape(W * rows, H),
                    prev_act=g[..., c0 + 1].astype(jnp.int32)
                    .reshape(W * rows),
                    rewards=rew,
                )
                dropped = m_sums[s] - k_sums[s]
            else:
                mask = mask_full
                loss_mask = lm3.astype(f32).reshape(Nc)
                up = dict(obs_cur=obs_cur4[:, :, s].reshape(Nc, D),
                          obs_prev=obs_prev4[:, :, s].reshape(Nc, D),
                          mem=mem4[:, :, s].reshape(Nc, H),
                          mem_prev=mem_prev4[:, :, s].reshape(Nc, H),
                          prev_act=prev_act3[:, :, s].reshape(Nc),
                          rewards=rewards3[:, :, s].reshape(Nc))
                dropped = jnp.int32(0)
                if quirk_inloop_shift:
                    # Q8: species s >= 2 read post-shift prev buffers. The
                    # reference shift copies species/pos/health/surrounding/
                    # reward/action/stats/hidden but NOT the sensor blocks
                    # (sim.cpp:1001 "we still need to copy the sensor obs"),
                    # so their obs_prev mixes PREV depth/semantic with
                    # CURRENT health/pos/surrounding. Every species'
                    # prev-hidden rows were already overwritten with its
                    # current memory by an earlier shift, and the reference
                    # trains all alive rows (no D9 masking).
                    if s > 0:
                        S_ = cfg.sensor_size
                        oc, op = up["obs_cur"], up["obs_prev"]
                        up["obs_prev"] = jnp.concatenate(
                            [op[:, :S_], oc[:, S_:S_ + 3],
                             op[:, S_ + 3:2 * S_ + 3],
                             oc[:, 2 * S_ + 3:]], axis=1)
                    up["mem_prev"] = up["mem"]
                    loss_mask = mask

            ts, actions, mem, m = _species_update(
                models[s], optimizer, train_states[s],
                up["obs_cur"], up["obs_prev"], up["mem"], up["mem_prev"],
                up["prev_act"], up["rewards"],
                mask, jax.random.fold_in(key, s), gamma, proper_log_probs,
                compute_dtype, loss_mask=loss_mask)
            new_tstates.append(ts)
            onehot = jax.nn.one_hot(actions, NUM_ACTIONS, dtype=jnp.int32)
            if rows < Asub:
                # Collect this species' [W, rows, 6+H] rows; ONE batched
                # expand_scatter after the loop writes all species back
                # (exact: one-hots are 0/1; new memory is written in the
                # dtype the next forward consumes).
                onehot_rows.append(
                    (onehot.astype(f32) * mask[:, None])
                    .reshape(W, rows, NUM_ACTIONS))
                mem_rows.append((mem * mask[:, None]).reshape(W, rows, H))
            else:
                action_cols.append(
                    (onehot * mask[:, None].astype(jnp.int32)).reshape(
                        W, Asub, NUM_ACTIONS))
                hidden_cols.append((mem * mask[:, None]).reshape(W, Asub, H))
            # Remaining reference wandb series (training_loop.py:105-120):
            # avg health, per-world population, popular (most-sampled) action
            # — population/reward/health always over the FULL alive set.
            m["count"] = mask_full.sum()
            m["reward"] = jnp.sum(rewards3[:, :, s].reshape(Nc) * mask_full)
            m["dropped_rows"] = dropped
            denom = jnp.maximum(m["count"], 1.0)
            health_s = state.health.reshape(W, Asub, NS)[:, :, s].reshape(Nc)
            m["avg_health"] = jnp.sum(health_s.astype(f32) * mask_full) / denom
            m["count_per_world"] = m["count"] / W
            hist = jnp.sum(jax.nn.one_hot(actions, NUM_ACTIONS, dtype=f32)
                           * mask[:, None], axis=0)
            m["popular_action"] = jnp.argmax(hist).astype(f32)
            for k, v in m.items():
                metrics[f"species_{s + 1}_{k}"] = v

        if rows < Asub:
            # ONE batched expansion scatter for all species' actions +
            # memory (zeros at rows no learner slot maps to: dead slots
            # AND dropped overflow act null, zero memory — the r2
            # semantics). bf16 mode transports memory in bf16 (the dtype
            # the next forward consumes — same cast point as the r2
            # scatter); f32 mode rides exact data movement inside
            # expand_scatter.
            sdt = bf16 if compute_dtype == jnp.bfloat16 else f32
            src = jnp.stack([jnp.concatenate([o, mm], axis=-1)
                             for o, mm in zip(onehot_rows, mem_rows)],
                            axis=0).reshape(G, rows,
                                            NUM_ACTIONS + H).astype(sdt)
            out = expand_scatter(src, slot, valid_g, Asub)  # [G, Asub, .]
            out4 = out.reshape(NS, W, Asub, NUM_ACTIONS + H).transpose(
                (1, 2, 0, 3))                             # [W, Asub, NS, .]
            new_action = out4[..., :NUM_ACTIONS].astype(jnp.int32)
            new_hidden = out4[..., NUM_ACTIONS:]
            state = env_mod.shift_observations_impl(state, cfg)
            state = state.replace(
                action=new_action.reshape(W, A, NUM_ACTIONS),
                hidden=new_hidden.reshape(state.hidden.shape).astype(
                    state.hidden.dtype))
            return state, tuple(new_tstates), metrics

        new_action = jnp.stack(action_cols, axis=2)  # [W, Asub, NS, 6]
        new_hidden = jnp.stack(hidden_cols, axis=2)  # [W, Asub, NS, H]

        # shift, then write actions + memory (training_loop.py:135-137).
        state = env_mod.shift_observations_impl(state, cfg)
        state = state.replace(
            action=new_action.reshape(W, A, NUM_ACTIONS),
            hidden=new_hidden.reshape(state.hidden.shape).astype(
                state.hidden.dtype),
        )
        if quirk_inloop_shift:
            # Q8 end-of-tick prev buffers: the reference's LAST shift runs
            # after species 1..NS-1 wrote their actions/memories but before
            # species NS did, so those classes' prev rows carry the NEW
            # values; only class NS-1 keeps the pre-update ones.
            last = ((jnp.arange(A, dtype=jnp.int32) % NS)
                    == NS - 1)[None, :, None]
            state = state.replace(
                prev_action=jnp.where(last, state.prev_action, state.action),
                prev_hidden=jnp.where(last, state.prev_hidden, state.hidden))
        return state, tuple(new_tstates), metrics

    return tick, optimizer


def rollout_train(tick, state, train_states, key, num_ticks: int):
    """lax.scan the train tick for num_ticks — the zero-host-roundtrip loop."""

    def body(carry, t):
        state, tstates, key = carry
        key, sub = jax.random.split(key)
        state, tstates, metrics = tick(state, tstates, sub)
        return (state, tstates, key), metrics

    (state, train_states, _), metrics = jax.lax.scan(
        body, (state, train_states, key), jnp.arange(num_ticks))
    return state, train_states, metrics
