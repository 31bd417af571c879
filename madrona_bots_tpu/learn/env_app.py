"""Legacy viewer-embedded training loop — parity with learn/env_app.py.

The reference's env_app (/root/reference/learn/env_app.py:1-87) runs the
older non-recurrent TD(0) training step INSIDE the viewer: a
`ScriptBotsViewer(0, 4, 69, 32, 1375, 768)` window whose loop calls a
train_step(sim_mgr) closure each frame — stepping the sim, slicing the
species-major exports, one gradient step per species, and writing one-hot
actions back into the exported action tensor.

Same flow here with the JAX legacy nets (models/legacy.py) and our
matplotlib viewer; headless backends save frames instead of opening a
window (viz/viewer.py).

Run: python -m madrona_bots_tpu.learn.env_app --num_worlds 4 --num_epochs 20
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from madrona_bots_tpu.config import NUM_ACTIONS
from madrona_bots_tpu.learn.util import construct_obs, set_seed
from madrona_bots_tpu.models.legacy import (LegacyActorCritic,
                                            LegacySpeciesNetGenerator,
                                            legacy_loss)
from madrona_bots_tpu.viz.viewer import ScriptBotsViewer


def make_train_step(models, opt, params, opt_states, num_species, key_holder):
    """The per-frame closure the viewer loop drives (env_app.py:40-87)."""
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
                   for s in range(num_species)]

    def train_step(sim_mgr, verbose: bool = False):
        sim_mgr.step()
        offsets = sim_mgr.species_offsets()
        all_rewards = sim_mgr.reward_tensor(False).to_numpy()[:, 0]
        action_buf = sim_mgr.action_tensor(False).to_numpy()
        for s in range(num_species):
            lo, hi = int(offsets[s]), int(offsets[s + 1])
            if hi <= lo:
                continue
            obs = jnp.asarray(np.ascontiguousarray(
                construct_obs(sim_mgr, lo, hi, prev=False)))
            key_holder[0], k = jax.random.split(key_holder[0])
            logits, _ = fwd[s](params[s], obs)
            acts = jax.random.categorical(k, logits)
            rewards = jnp.asarray(all_rewards[lo:hi])
            params[s], opt_states[s] = updates_jit[s](
                params[s], opt_states[s], obs, acts, rewards)
            if verbose:
                print(f"Species {s + 1}: updated on {hi - lo} agents")
            onehot = np.zeros((hi - lo, NUM_ACTIONS), np.int32)
            onehot[np.arange(hi - lo), np.asarray(acts)] = 1
            action_buf[lo:hi] = onehot
        sim_mgr.shift_observations()

    return train_step


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_worlds", type=int, default=4)      # env_app.py:13
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--num_species", type=int, default=4)
    p.add_argument("--obs_dim", type=int, default=69)
    p.add_argument("--hidden_dim", type=int, default=128)
    p.add_argument("--action_dim", type=int, default=6)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=69)           # env_app.py:13
    p.add_argument("--window_width", type=int, default=1375)
    p.add_argument("--window_height", type=int, default=768)
    p.add_argument("--frame_dir", type=str, default="viewer_frames")
    args = p.parse_args(argv)

    set_seed(args.seed)
    viewer_app = ScriptBotsViewer(0, args.num_worlds, args.seed, 32,
                                  args.window_width, args.window_height,
                                  frame_dir=args.frame_dir)
    sim_mgr = viewer_app.get_sim_mgr()

    gen = LegacySpeciesNetGenerator(args.obs_dim, args.action_dim,
                                    args.hidden_dim, seed=args.seed)
    models = [LegacyActorCritic.from_generator(gen)
              for _ in range(args.num_species)]
    opt = optax.adam(args.lr)
    params = [m.init(jax.random.fold_in(jax.random.key(args.seed), i))
              for i, m in enumerate(models)]
    opt_states = [opt.init(pr) for pr in params]
    key_holder = [jax.random.key(args.seed + 1)]

    train_step = make_train_step(models, opt, params, opt_states,
                                 args.num_species, key_holder)
    viewer_app.loop(args.num_epochs,
                    lambda epoch, carry: train_step(sim_mgr))
    return params


if __name__ == "__main__":
    main()
