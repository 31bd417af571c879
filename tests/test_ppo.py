"""PPO trainer tests (small shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_bots_tpu import EnvConfig, init_state
from madrona_bots_tpu.learn.a2c import init_train_states
from madrona_bots_tpu.learn.ppo import make_ppo_trainer
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator


def test_ppo_iteration_runs_and_updates():
    cfg = EnvConfig(num_worlds=2, init_agents=16, max_agents=32)
    gen = SpeciesNetGenerator(cfg.obs_dim, 6, 16, cfg.hidden_state_dim, seed=0)
    models = [ActorCritic.from_generator(gen) for _ in range(4)]
    ppo_iter, opt = make_ppo_trainer(models, cfg, rollout_len=4,
                                     num_minibatches=2, update_epochs=1)
    tstates = init_train_states(models, jax.random.key(1), opt)
    state = init_state(jax.random.key(0), cfg)
    p0 = jax.tree.map(jnp.copy, tstates[0].params)

    for t in range(2):
        state, tstates, metrics = ppo_iter(state, tstates,
                                           jax.random.fold_in(jax.random.key(2), t))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         p0, tstates[0].params)
    assert max(jax.tree.leaves(diffs)) > 0
    assert int(state.step_count) == 8  # 2 iterations x 4 rollout steps
    assert int(state.alive.sum()) > 0
