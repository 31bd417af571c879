"""Multi-host (pod slice) support — BASELINE config[4].

The reference has no distributed story at all (SURVEY §2d: no NCCL/MPI/
torch.distributed anywhere); here the multi-host path is the SAME GSPMD code
as single-host: `jax.distributed.initialize()` then a mesh over all global
devices. Worlds shard across hosts over DCN and across chips over ICI;
params replicate; the learner's summed-over-worlds gradients become psum
collectives inserted by the compiler. World independence + global-world-id
keyed RNG (SPEC "RNG discipline") makes trajectories invariant to host
count (SURVEY §7 hard part 6).

Testable without a pod: `tests/test_sharding.py` runs the same mesh path on
8 virtual CPU devices; this module only adds process bootstrap + per-host
IO conventions.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from madrona_bots_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """jax.distributed bootstrap. On Cloud TPU the arguments auto-detect;
    pass them explicitly for manual launches."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return global_mesh()


def global_mesh():
    """Mesh over every chip of the slice (ICI within host, DCN across)."""
    return make_mesh(jax.devices())


def is_coordinator() -> bool:
    return jax.process_index() == 0
