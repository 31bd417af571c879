"""Real multi-process jax.distributed test (BASELINE config[4] logic).

Spawns 2 OS processes that each own 4 virtual CPU devices, bootstrap through
`parallel.distributed.initialize`, build the global 8-device mesh, construct
their host-local world shards, and run one sharded env step. Host-count
invariance of the trajectory (worlds keyed by global id — SPEC "RNG
discipline") is asserted by comparing against a single-process run.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

coord, rank = sys.argv[1], int(sys.argv[2])
from madrona_bots_tpu.parallel import distributed
mesh = distributed.initialize(coord, 2, rank)

from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.parallel.mesh import state_sharding

W = 8
cfg = EnvConfig(num_worlds=W, init_agents=8, max_agents=16)

# Global SPMD construction: jit with explicit out_shardings builds the
# worlds-sharded global state collectively (no host materializes it all).
sharding = state_sharding(mesh)
state = jax.jit(lambda: init_state(jax.random.key(0), cfg),
                out_shardings=sharding)()

acts = jnp.zeros((W, 16, NUM_ACTIONS), jnp.int32).at[..., 0].set(1)
step = jax.jit(lambda s: env_mod.step(env_mod.set_actions(s, acts), cfg))
state = step(state)
csum = float(jax.device_get(
    state.pos.sum() + state.alive.sum() + state.health.sum()))
print(json.dumps({"rank": rank, "csum": csum}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, PYTHONPATH=repo, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, coord, str(r)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, text=True)
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=280)
        if p.returncode != 0:
            pytest.skip(f"distributed CPU runtime unavailable: {err[-500:]}")
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # Single-process ground truth (same seed, same actions).
    import jax
    import jax.numpy as jnp
    from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
    from madrona_bots_tpu.env import env as env_mod
    from madrona_bots_tpu.env.state import init_state

    cfg = EnvConfig(num_worlds=8, init_agents=8, max_agents=16)
    s = init_state(jax.random.key(0), cfg)
    acts = jnp.zeros((8, 16, NUM_ACTIONS), jnp.int32).at[..., 0].set(1)
    s = env_mod.step(env_mod.set_actions(s, acts), cfg)
    ref = float(jax.device_get(s.pos.sum() + s.alive.sum() + s.health.sum()))

    for o in outs:
        assert abs(o["csum"] - ref) < 1e-3 * max(1.0, abs(ref)), (o, ref)
