"""Checkpoint save/restore round-trip (reference ckpt.py semantics)."""

import glob
import os

import jax
import numpy as np

from madrona_bots_tpu.learn.a2c import make_optimizer
from madrona_bots_tpu.learn.ckpt import CheckpointManager, confirm_load
from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator


def _model_and_state(seed=0):
    gen = SpeciesNetGenerator(69, 6, 32, 16, seed=seed)
    model = ActorCritic.from_generator(gen)
    params = model.init(jax.random.key(seed))
    opt = make_optimizer()
    return model, params, opt.init(params), opt


def test_save_load_roundtrip(tmp_path):
    model, params, opt_state, opt = _model_and_state()
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(model, params, opt_state, "species_1", 5, metric_name="latest")

    m2, p2, o2, epoch = ckpt.load(ActorCritic, opt, "species_1")
    assert epoch == 5
    assert m2.get_config() == model.get_config()
    assert confirm_load(params, p2)
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_deletes_old(tmp_path):
    model, params, opt_state, opt = _model_and_state()
    ckpt = CheckpointManager(str(tmp_path))
    for epoch in (1, 2, 3):
        ckpt.save(model, params, opt_state, "species_1", epoch)
    files = glob.glob(str(tmp_path / "species_1" / "latest_model_epoch_*"))
    assert len(files) == 1 and "epoch_3" in files[0]


def test_best_metric_files_coexist(tmp_path):
    model, params, opt_state, opt = _model_and_state()
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(model, params, opt_state, "species_2", 1, metric_name="latest")
    ckpt.save(model, params, opt_state, "species_2", 2, metric_name="actor_loss")
    ckpt.save(model, params, opt_state, "species_2", 4, metric_name="actor_loss")
    ckpt.save(model, params, opt_state, "species_2", 3, metric_name="critic_loss")
    names = sorted(os.listdir(tmp_path / "species_2"))
    assert names == ["best_actor_loss_epoch_4.ckpt.npz",
                     "best_critic_loss_epoch_3.ckpt.npz",
                     "latest_model_epoch_1.ckpt.npz"]
    _, _, _, epoch = ckpt.load(ActorCritic, opt, "species_2",
                               metric_name="actor_loss")
    assert epoch == 4


def test_restore_after_training_continues(tmp_path):
    """Config-rebuild path: restore into a fresh process-like flow and verify
    forward outputs match (the reference's confirm_load check, util.py:53-62)."""
    model, params, opt_state, opt = _model_and_state(seed=3)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(model, params, opt_state, "species_1", 7)
    m2, p2, _, _ = ckpt.load(ActorCritic, opt, "species_1")
    obs = jax.random.normal(jax.random.key(1), (4, 69))
    mem = jax.random.normal(jax.random.key(2), (4, 16))
    o1 = model.forward(params, obs, mem)
    o2 = m2.forward(p2, obs, mem)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sim_state_roundtrip(tmp_path):
    """Full simulator-state checkpoint (capability beyond the reference)."""
    import jax.numpy as jnp
    from madrona_bots_tpu import EnvConfig, init_state, step
    from madrona_bots_tpu.env.env import set_actions
    from madrona_bots_tpu.learn.ckpt import load_sim_state, save_sim_state
    cfg = EnvConfig(num_worlds=2, init_agents=16, max_agents=32)
    s = init_state(jax.random.key(0), cfg)
    acts = jnp.zeros((2, 32, 6), jnp.int32).at[..., 0].set(1)
    s = step(set_actions(s, acts), cfg)
    path = str(tmp_path / "state.npz")
    save_sim_state(s, path)
    s2 = load_sim_state(init_state(jax.random.key(0), cfg), path)

    def raw(x):
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            return np.asarray(jax.random.key_data(x))
        return np.asarray(x)

    for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(raw(a), raw(b))
    # restored state steps identically to the original
    s_next = step(s, cfg)
    s2_next = step(set_actions(s2, jnp.asarray(np.asarray(s2.action))), cfg)
    np.testing.assert_array_equal(np.asarray(s_next.alive),
                                  np.asarray(s2_next.alive))


def test_save_is_crash_safe_ordering(tmp_path):
    """The new checkpoint file must exist before stale ones are deleted
    (write-then-delete): after two saves only the newest remains, and the
    file written by save N is never the deletion victim of save N."""
    import glob
    import jax
    from madrona_bots_tpu.learn.ckpt import CheckpointManager
    from madrona_bots_tpu.models import ActorCritic, SpeciesNetGenerator

    gen = SpeciesNetGenerator(69, 6, 16, 16, seed=0)
    model = ActorCritic.from_generator(gen)
    params = model.init(jax.random.key(0))
    import optax
    opt = optax.adam(1e-3)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(model, params, opt.init(params), "species_1", 1)
    ckpt.save(model, params, opt.init(params), "species_1", 2)
    files = sorted(glob.glob(str(tmp_path / "species_1" / "latest_*")))
    assert len(files) == 1 and "epoch_2" in files[0], files
    # Saving the SAME epoch twice must not delete the file it just wrote.
    ckpt.save(model, params, opt.init(params), "species_1", 2)
    files = glob.glob(str(tmp_path / "species_1" / "latest_*"))
    assert len(files) == 1 and "epoch_2" in files[0], files
