"""Device mesh + sharding specs: worlds-sharded, params replicated.

The reference is single-GPU (SURVEY §2d: no NCCL/MPI anywhere); its scaling
axis is the batch of independent worlds. The TPU-native scaling story keeps
that axis: shard `WorldState` along `worlds` over every chip of a pod slice
(`jax.sharding.Mesh`), replicate the 4 species' parameters, and let GSPMD
insert the psum over ICI/DCN for the learner's summed-over-batch gradients.
All env scatters/gathers are world-local, so the sim step partitions with
ZERO communication.

Multi-host: call `jax.distributed.initialize()` before building the mesh;
`make_mesh()` uses all global devices and the same code path (GSPMD) scales
from 1 chip to a pod slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from madrona_bots_tpu.env.state import WorldState

WORLD_AXIS = "worlds"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (WORLD_AXIS,))


def state_sharding(mesh: Mesh) -> WorldState:
    """A WorldState of NamedShardings: every per-world leaf split on dim 0,
    scalars replicated."""
    shard = NamedSharding(mesh, P(WORLD_AXIS))
    repl = NamedSharding(mesh, P())

    def spec(leaf_name):
        return repl if leaf_name == "step_count" else shard

    fields = {f: spec(f) for f in WorldState.__dataclass_fields__}
    return WorldState(**fields)


def shard_state(state: WorldState, mesh: Mesh) -> WorldState:
    """Place a (host or single-device) state onto the mesh."""
    shardings = state_sharding(mesh)
    return jax.tree.map(jax.device_put, state, shardings)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
