"""PPO actor-learner with on-device rollout buffers.

BASELINE.json's north star names PPO as the scaling algorithm (configs 2-4);
the reference itself only ships TD(0)-A2C (models.py:180-184), so A2C
(learn/a2c.py) is the learning-curve-parity path and this module is the
scale path. Everything stays on device: `lax.scan` collects a T-step rollout
into compact buffers (sensor bytes stay uint8/int8 — the 69-dim float obs is
reconstructed at update time), GAE runs over the scan axis, and each species
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
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from madrona_bots_tpu.config import NUM_ACTIONS, EnvConfig
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.state import WorldState
from madrona_bots_tpu.learn.a2c import SpeciesTrainState
from madrona_bots_tpu.learn.obs import pack_obs_fields
from madrona_bots_tpu.learn.pack import Packer, gather_rows, scatter_rows
from madrona_bots_tpu.models.actor_critic import ActorCritic

f32 = jnp.float32


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


def _flat_obs(depth, health, pos, semantic, surrounding, dtype=f32):
    """The 69-dim obs layout (util.py:23-28) from compact storage."""
    return jnp.concatenate([
        depth.astype(dtype), health[..., None].astype(dtype),
        pos.astype(dtype), semantic.astype(dtype),
        surrounding.astype(dtype)], axis=-1)


def make_ppo_optimizer(lr: float = 3e-4, max_grad_norm: float = 0.5
                       ) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(lr, eps=1e-5),
    )


def make_ppo_trainer(models: Sequence[ActorCritic], cfg: EnvConfig,
                     rollout_len: int = 16, num_minibatches: int = 4,
                     update_epochs: int = 2, clip_eps: float = 0.2,
                     gamma: float = 0.99, gae_lambda: float = 0.95,
                     vf_coef: float = 0.5, ent_coef: float = 0.01,
                     lr: float = 3e-4, max_grad_norm: float = 0.5,
                     use_pallas: bool = False, optimizer=None,
                     compute_dtype=None, learner_slots_per_class=None,
                     decorrelate: bool = True, compact_rollout: bool = True):
    """Returns (ppo_iteration, optimizer).

    ppo_iteration(state, train_states, key) -> (state, train_states, metrics)
    collects `rollout_len` env steps with the current policies and performs
    `update_epochs x num_minibatches` clipped-surrogate updates per species.
    """
    if optimizer is None:
        optimizer = make_ppo_optimizer(lr, max_grad_norm)
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

    # Rematerialized forward for the update loss: without checkpointing,
    # every minibatch backward stores ~6 [mb, hidden] activation tensors
    # to HBM (~600 MB per 393k-row update) — the dominant update cost on
    # v5e. Recomputing them in the backward trades ~1/3 more FLOPs for
    # that traffic.
    _fwd_remat = jax.checkpoint(_fwd, static_argnums=(0,))

    def policy_step(params_list, state: WorldState, key):
        """Sample actions for every species; returns [W, A]-shaped records.

        Slots are species-class partitioned (SPEC D2b), so each species'
        batch is the contiguous strided view [:, :, s] — each net forwards
        only its own 1/NS of the rows, no sort/gather. With
        learner_slots_per_class the rollout forwards also run on alive-row
        compacted batches (overflow agents beyond the cap act null that
        step — same negligible-drop cap as the update path)."""
        W, A = state.alive.shape
        Asub = A // NS
        rows = (Asub if not compact_rollout or learner_slots_per_class is None
                or learner_slots_per_class >= Asub else learner_slots_per_class)
        Nc = W * rows
        obs_dtype = f32 if cd is None else cd
        if rows == Asub:
            obs = _flat_obs(state.sensor_depth, state.health, state.pos,
                            state.sensor_semantic, state.surrounding,
                            obs_dtype)
            obs4 = obs.reshape(W, Asub, NS, obs.shape[-1])
        H = state.hidden.shape[-1]

        def cls(x, s):
            return x.reshape((W, Asub, NS) + x.shape[2:])[:, :, s]

        mem4 = state.hidden.reshape(W, Asub, NS, H)
        alive3 = state.alive.reshape(W, Asub, NS)
        sp3 = state.species.reshape(W, Asub, NS)
        a_c, lp_c, v_c, h_c, k_c = [], [], [], [], []
        for s in range(NS):
            m3 = alive3[:, :, s] & (sp3[:, :, s] == s + 1)      # [W, Asub]
            kept = jnp.ones_like(m3)
            if rows < Asub:
                rank = jnp.cumsum(m3.astype(jnp.int32), axis=1) - 1
                keep = m3 & (rank < rows)
                # Overflow agents beyond the cap must act NULL (all-zero
                # action vector), not one_hot(0)=FORWARD: the caller masks
                # its one-hot by this kept flag (advisor r2, medium).
                kept = keep | ~m3
                oh = ((rank[:, None, :] == jnp.arange(rows)[None, :, None])
                      & keep[:, None, :])                        # [W, r, Asub]

                # Obs fields + memory + mask ride ONE exact bf16 gather
                # (learn/pack.py); the full [W, A, 69] obs tensor is never
                # materialized.
                pk = Packer()
                fin_obs = pack_obs_fields(
                    pk, cls(state.sensor_depth, s), cls(state.health, s),
                    cls(state.pos, s), cls(state.sensor_semantic, s),
                    cls(state.surrounding, s), dtype=obs_dtype)
                (pk.add_bf16 if cd is not None else pk.add_f32)(mem4[:, :, s])
                pk.add_int(m3)
                fld = pk.unpack(gather_rows(oh, pk.payload()))
                o_in = fin_obs(*fld[0:5]).reshape(Nc, -1)
                m_in = fld[5].reshape(Nc, H)
                mk = fld[6].reshape(Nc)
            else:
                o_in = obs4[:, :, s].reshape(Nc, obs4.shape[-1])
                m_in = mem4[:, :, s].reshape(Nc, H)
                mk = m3.reshape(Nc).astype(f32)
            logits, v, h = _fwd(s, params_list[s], o_in, m_in)
            a = jax.random.categorical(jax.random.fold_in(key, s), logits)
            lsm = jax.nn.log_softmax(logits, -1)
            lp = jnp.sum(lsm * jax.nn.one_hot(a, lsm.shape[-1],
                                              dtype=lsm.dtype), axis=1)
            mb = mk > 0.5
            if rows < Asub:
                # One exact bf16 scatter for all four write-backs (action
                # ids < 6 are int-exact; logp/value ride the 3-way split;
                # new memory is bf16-exact in bf16 mode).
                spk = Packer()
                spk.add_int(jnp.where(mb, a, 0).reshape(W, rows))
                spk.add_f32(jnp.where(mb, lp, 0.0).reshape(W, rows))
                spk.add_f32(jnp.where(mb, v, 0.0).reshape(W, rows))
                (spk.add_bf16 if cd is not None else spk.add_f32)(
                    (h * mk[:, None]).reshape(W, rows, H))
                so = spk.unpack(scatter_rows(oh, spk.payload()))
                a_c.append(so[0].astype(jnp.int32))
                lp_c.append(so[1])
                v_c.append(so[2])
                h_c.append(so[3])
            else:
                a_c.append(jnp.where(mb, a, 0).reshape(W, Asub))
                lp_c.append(jnp.where(mb, lp, 0.0).reshape(W, Asub))
                v_c.append(jnp.where(mb, v, 0.0).reshape(W, Asub))
                h_c.append((h * mk[:, None]).reshape(W, Asub, H))
            k_c.append(kept)
        action = jnp.stack(a_c, axis=2).reshape(W, A)
        logp = jnp.stack(lp_c, axis=2).reshape(W, A)
        value = jnp.stack(v_c, axis=2).reshape(W, A)
        new_hidden = jnp.stack(h_c, axis=2).reshape(state.hidden.shape)
        kept_all = jnp.stack(k_c, axis=2).reshape(W, A)
        return action, logp, value, new_hidden, kept_all

    @functools.partial(jax.jit, donate_argnums=(0,))
    def ppo_iteration(state: WorldState, train_states, key):
        params_list = [ts.params for ts in train_states]
        W, A = state.alive.shape

        def env_body(carry, t):
            state, key = carry
            key, k_act = jax.random.split(key)
            mem_in = state.hidden
            action, logp, value, new_hidden, kept = policy_step(
                params_list, state, k_act)
            onehot = jax.nn.one_hot(action, NUM_ACTIONS, dtype=jnp.int32)
            onehot = onehot * kept[..., None]   # overflow rows act null
            rec_pre = dict(
                depth=state.sensor_depth, semantic=state.sensor_semantic,
                health=state.health, pos=state.pos,
                surrounding=state.surrounding, memory=mem_in.reshape(W, A, -1),
                species=state.species, alive=state.alive,
                action=action.reshape(W, A).astype(jnp.int8),
                logp=logp.reshape(W, A), value=value.reshape(W, A))
            state = state.replace(
                action=onehot.reshape(W, A, NUM_ACTIONS) * state.alive[..., None],
                hidden=new_hidden)
            state = env_mod.sensor_pass(
                env_mod.step_systems(state, cfg, use_pallas), cfg, use_pallas)
            rec = Rollout(reward=state.reward, next_alive=state.alive,
                          **rec_pre)
            return (state, key), rec

        (state, key), roll = jax.lax.scan(env_body, (state, key),
                                          jnp.arange(T))

        # Bootstrap values at T with the current policy.
        _, _, last_value, _, _ = policy_step(params_list, state,
                                             jax.random.fold_in(key, 999))
        last_value = last_value.reshape(W, A)

        # GAE over the scan axis; continuing env (no resets, quirk Q7), agent
        # death = terminal with 0 bootstrap.
        def gae_body(carry, rec):
            gae, next_value = carry
            alive_next = rec.next_alive & rec.alive
            nv = jnp.where(alive_next, next_value, 0.0)
            delta = rec.reward + gamma * nv - rec.value
            gae = delta + gamma * gae_lambda * jnp.where(alive_next, gae, 0.0)
            return (gae, rec.value), gae

        (_, _), advantages = jax.lax.scan(
            gae_body, (jnp.zeros((W, A), f32), last_value), roll, reverse=True)
        returns = advantages + roll.value

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

        def update_species(s, ts):
            mask_full = fl(roll.alive, s) & (fl(roll.species, s) == s + 1)
            reward_total = jnp.sum(fl(roll.reward, s) * mask_full)
            count_total = mask_full.sum()

            if rows < Asub:
                # Learner-row compaction: only ~pop/Asub of the padded class
                # slots are alive, so gather each (t, w) group's alive rows
                # into the first `rows` learner slots. ALL buffers (obs
                # fields straight from the rollout records, memory, action,
                # logp, advantages, returns, values, mask) ride ONE exact
                # bf16 contraction (learn/pack.py) — the full [B, 69] obs
                # buffer is never built. Groups with more than `rows` alive
                # agents drop the highest-slot overflow; the dropped
                # fraction is reported as species_*_dropped_rows (zero at
                # typical populations).
                #
                # The gather runs as a lax.map over the T axis: a single
                # whole-buffer pack at G = T*W groups makes XLA materialize
                # padded bf16 payload temps for the entire rollout at once
                # (each [G, Asub, 1] scalar column pads 128x on the lane
                # axis — 26 GB of HLO temp at 8192 worlds, OOM on v5e).
                # Per-t chunks keep only one step's intermediates live.
                def fl4(x):
                    x5 = x.reshape((T, W, Asub, NS) + x.shape[3:])
                    return x5[:, :, :, s]

                def compact_t(sl):
                    (d_t, h_t, p_t, sm_t, su_t, mem_t, act_t, lp_t,
                     adv_t, ret_t, val_t, m3_t) = sl
                    rank = jnp.cumsum(m3_t.astype(jnp.int32), axis=1) - 1
                    keep = m3_t & (rank < rows)
                    oh = ((rank[:, None, :]
                           == jnp.arange(rows)[None, :, None])
                          & keep[:, None, :])              # [W, rows, Asub]
                    pk = Packer()
                    fin_obs = pack_obs_fields(
                        pk, d_t, h_t, p_t, sm_t, su_t,
                        dtype=f32 if cd is None else cd)
                    pk.add_f32(mem_t)
                    pk.add_int(act_t)
                    pk.add_f32(lp_t)
                    pk.add_f32(adv_t)
                    pk.add_f32(ret_t)
                    pk.add_f32(val_t)
                    pk.add_int(m3_t)
                    fld = pk.unpack(gather_rows(oh, pk.payload()))
                    return (fin_obs(*fld[0:5]),) + tuple(fld[5:12]) + (
                        keep.sum(),)

                outs = jax.lax.map(compact_t, (
                    fl4(roll.depth), fl4(roll.health), fl4(roll.pos),
                    fl4(roll.semantic), fl4(roll.surrounding),
                    fl4(roll.memory), fl4(roll.action), fl4(roll.logp),
                    fl4(advantages), fl4(returns), fl4(roll.value),
                    mask_full.reshape(T, W, Asub)))
                obs_all = outs[0].reshape(B, -1)
                mem_b = outs[1].reshape(B, -1)
                act_b = outs[2].astype(jnp.int32).reshape(B)
                logp_b = outs[3].reshape(B)
                adv_b = outs[4].reshape(B)
                ret_b = outs[5].reshape(B)
                val_b = outs[6].reshape(B)
                mask_sp = outs[7].reshape(B) > 0.5
                dropped = count_total - outs[8].sum()
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

            def mb_major(x):
                # [B, ...] -> [M, mb, ...]: each minibatch becomes one
                # CONTIGUOUS leading-axis slice. The optimization barrier
                # forces XLA to materialize this layout once instead of
                # re-fusing the obs reconstruction + roll + strided pick
                # into every minibatch update (measured 38 -> ~15 ms per
                # 1M-row update on v5e).
                return jnp.swapaxes(
                    x.reshape((mb, num_minibatches) + x.shape[1:]), 0, 1)

            bufs = jax.lax.optimization_barrier(tuple(
                mb_major(jnp.roll(x, roll_off, axis=0))
                for x in (obs_all, mem_b, act_b, logp_b,
                          adv_b, ret_b, val_b, mask_sp)))

            def loss_fn(params, picked):
                o, m, a, lp_old, adv, ret, vold, msk = picked
                w = msk.astype(f32)
                denom = jnp.maximum(w.sum(), 1.0)
                # normalize advantages over the species minibatch
                mu = jnp.sum(adv * w) / denom
                var = jnp.sum((adv - mu) ** 2 * w) / denom
                adv_n = (adv - mu) * jax.lax.rsqrt(var + 1e-8)

                logits, v, _ = _fwd_remat(s, params, o, m)
                lsm_new = jax.nn.log_softmax(logits, -1)
                logp_new = jnp.sum(
                    lsm_new * jax.nn.one_hot(a, lsm_new.shape[-1],
                                             dtype=lsm_new.dtype), axis=1)
                ratio = jnp.exp(logp_new - lp_old)
                pg = -jnp.minimum(
                    ratio * adv_n,
                    jnp.clip(ratio, 1 - clip_eps, 1 + clip_eps) * adv_n)
                v_clip = vold + jnp.clip(v - vold, -clip_eps, clip_eps)
                v_loss = 0.5 * jnp.maximum((v - ret) ** 2, (v_clip - ret) ** 2)
                probs = jax.nn.softmax(logits, -1)
                ent = -jnp.sum(probs * jnp.log(jnp.clip(probs, 1e-12)), -1)
                loss = (jnp.sum(pg * w) + vf_coef * jnp.sum(v_loss * w)
                        - ent_coef * jnp.sum(ent * w)) / denom
                return loss, (jnp.sum(pg * w) / denom,
                              jnp.sum(v_loss * w) / denom,
                              jnp.sum(ent * w) / denom)

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
