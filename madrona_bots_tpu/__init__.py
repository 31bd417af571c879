"""madrona_bots_tpu — a TPU-native rebuild of llGuy/madrona-bots.

A batched multi-agent ecology/evolution RL environment plus per-species
actor-critic training, redesigned for TPU: the Madrona batch-ECS world
(reference: /root/reference/src/sim) becomes a struct-of-arrays pytree whose
step is one jitted, vmapped function over worlds; the raycast lidar sensor is
a Pallas TPU kernel; the learner is an on-device actor-learner sharded over a
`jax.sharding.Mesh` of chips.

Layering (mirrors SURVEY.md §1, TPU-first):
    L5  learn/            training CLI + loops (A2C parity, PPO scale path)
    L4  api/manager.py    SimManager-compatible Python surface
    L3  env/              jitted step / sensor / shift functions (the "executor")
    L2  env/systems.py    the per-system step logic (the "taskgraph nodes")
    L1  XLA/Pallas        compilation + kernels (replaces Madrona megakernel)
"""

from madrona_bots_tpu.config import EnvConfig, RewardSetting
from madrona_bots_tpu.env.state import WorldState
from madrona_bots_tpu.env.env import init_state, step, sensor_pass, shift_observations

__version__ = "0.1.0"

__all__ = [
    "EnvConfig",
    "RewardSetting",
    "WorldState",
    "init_state",
    "step",
    "sensor_pass",
    "shift_observations",
]
