"""Utilities — parity with learn/util.py.

`construct_obs` builds the 69-dim flat observation from a SimManager's
exported tensors in the reference's layout: [depth(32), health(1), pos(2),
semantic(32), surrounding(2)] (util.py:14-29). `set_seed` seeds python/numpy
RNGs (util.py:9-12; JAX randomness is explicit-key so nothing to seed there).
"""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed_value: int):
    random.seed(seed_value)
    np.random.seed(seed_value)


def construct_obs(sim_mgr, start: int, end: int, prev: bool = False,
                  verbose: bool = False) -> np.ndarray:
    depth = sim_mgr.depth_tensor(prev).to_numpy()[start:end]
    health = sim_mgr.health_tensor(prev).to_numpy()[start:end]
    pos = sim_mgr.position_tensor(prev).to_numpy()[start:end]
    semantic = sim_mgr.semantic_tensor(prev).to_numpy()[start:end]
    surrounding = sim_mgr.surrounding_tensor(prev).to_numpy()[start:end]
    if verbose:
        for name, t in [("depth", depth), ("health", health),
                        ("position", pos), ("semantic", semantic),
                        ("surrounding", surrounding)]:
            print(f"Shape of {name} tensor: ", t.shape)
    return np.concatenate([
        depth.astype(np.float32), health.astype(np.float32),
        pos.astype(np.float32), semantic.astype(np.float32),
        surrounding.astype(np.float32)], axis=1)


def confirm_load(original_params, loaded_params):
    from madrona_bots_tpu.learn.ckpt import confirm_load as _cl
    return _cl(original_params, loaded_params)
