"""Legacy headless driver — parity with learn/env.py (the older loop that
uses the non-recurrent model.py nets and prints simulator FPS, env.py:1-103).

Run: python -m madrona_bots_tpu.learn.env --num_worlds 2048 --num_epochs 100
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from madrona_bots_tpu.api.manager import SimManager
from madrona_bots_tpu.config import NUM_ACTIONS
from madrona_bots_tpu.learn.util import construct_obs, set_seed
from madrona_bots_tpu.models.legacy import (LegacyActorCritic,
                                            LegacySpeciesNetGenerator,
                                            legacy_loss)

import optax


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_worlds", type=int, default=2048)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--num_species", type=int, default=4)
    p.add_argument("--obs_dim", type=int, default=69)
    p.add_argument("--hidden_dim", type=int, default=128)
    p.add_argument("--action_dim", type=int, default=6)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    set_seed(args.seed)
    sim_mgr = SimManager(0, args.num_worlds, args.seed, 32)

    gen = LegacySpeciesNetGenerator(args.obs_dim, args.action_dim,
                                    args.hidden_dim, seed=args.seed)
    models = [LegacyActorCritic.from_generator(gen)
              for _ in range(args.num_species)]
    opt = optax.adam(args.lr)
    params = [m.init(jax.random.fold_in(jax.random.key(args.seed), i))
              for i, m in enumerate(models)]
    opt_states = [opt.init(pr) for pr in params]

    fwd = [jax.jit(m.forward) for m in models]

    def update(s, pr, opt_state, obs, acts, rewards):
        def loss_fn(pp):
            logits, v = models[s].forward(pp, obs)
            lsm = jax.nn.log_softmax(logits, -1)
            logp = jnp.sum(lsm * jax.nn.one_hot(acts, lsm.shape[-1],
                                                dtype=lsm.dtype), axis=1)
            actor, critic = legacy_loss(logp, rewards, v)
            return actor + critic
        grads = jax.grad(loss_fn)(pr)
        updates, opt_state = opt.update(grads, opt_state, pr)
        return optax.apply_updates(pr, updates), opt_state

    updates_jit = [jax.jit(lambda pr, o, ob, a, r, s=s:
                           update(s, pr, o, ob, a, r))
                   for s in range(args.num_species)]

    times = []
    key = jax.random.key(args.seed + 1)
    for epoch in range(1, args.num_epochs + 1):
        t0 = time.time()
        sim_mgr.step()
        times.append(time.time() - t0)

        counts = sim_mgr.species_count_tensor().to_numpy()
        offsets = sim_mgr.species_offsets()
        all_rewards = sim_mgr.reward_tensor(False).to_numpy()[:, 0]
        action_buf = sim_mgr.action_tensor(False).to_numpy()
        for s in range(args.num_species):
            lo, hi = int(offsets[s]), int(offsets[s + 1])
            if hi <= lo:
                continue
            obs = jnp.asarray(np.ascontiguousarray(
                construct_obs(sim_mgr, lo, hi, prev=False)))
            key, k = jax.random.split(key)
            logits, values = fwd[s](params[s], obs)
            acts = jax.random.categorical(k, logits)
            rewards = jnp.asarray(all_rewards[lo:hi])
            params[s], opt_states[s] = updates_jit[s](
                params[s], opt_states[s], obs, acts, rewards)
            onehot = np.zeros((hi - lo, NUM_ACTIONS), np.int32)
            onehot[np.arange(hi - lo), np.asarray(acts)] = 1
            action_buf[lo:hi] = onehot
        sim_mgr.shift_observations()
        if epoch % 10 == 0 or epoch == 1:
            print(f"epoch {epoch} pop={counts.sum()}")

    avg = float(np.mean(times[1:])) if len(times) > 1 else times[0]
    print(f"Average FPS for simulator: {args.num_worlds / avg}")


if __name__ == "__main__":
    main()
