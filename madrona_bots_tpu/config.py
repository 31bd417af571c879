"""Environment configuration.

The reference hardcodes world geometry inside Manager::Impl::make
(/root/reference/src/entry/mgr.cpp:104-113) and scatters constants through
src/sim/{types.hpp,sim.cpp}. Here every knob is a first-class static field of
`EnvConfig`; the config is hashable so it can be a `static_argnum` under jit.
"""

from __future__ import annotations

import dataclasses
import enum
import math


class RewardSetting(enum.IntEnum):
    """The 9 reward settings from rewardSystem (sim.cpp:840-983).

    Only SETTING_8 is active in the reference (sim.cpp:942-957); the others
    are reconstructed from its comment blocks — including the SECOND
    "REWARD SETTING 7" block that trails setting 8 (sim.cpp:959-977), kept
    here as SETTING_7B. The run-name convention in
    learn/training_loop.py:140-151 encodes which setting trained a universe.
    """

    SETTING_2 = 2  # population health + per-event (repro +10, friendly -5, enemy +15, food +7) + edge penalty
    SETTING_3 = 3  # positive only: repro +10, enemy +15, food +7
    SETTING_4 = 4  # repro +10, enemy +15, friendly -5, food +7
    SETTING_5 = 5  # population health only
    SETTING_6 = 6  # population health + food +10
    SETTING_7 = 7  # population health + food +10 + repro +10
    SETTING_8 = 8  # population health + food +10 + repro +10 + enemy +15  (ACTIVE default)
    SETTING_7B = 9  # trailing variant (sim.cpp:959-977): population health + repro +10, friendly -5, enemy +15, food +7


# Action flag indices within the 6-wide int32 action vector (types.hpp:22-33).
ACTION_FORWARD = 0
ACTION_BACKWARD = 1
ACTION_ROTATE_LEFT = 2
ACTION_ROTATE_RIGHT = 3
ACTION_SHOOT = 4
ACTION_BREED = 5
NUM_ACTIONS = 6

# RNG stream salts (SPEC.md "RNG discipline").
SALT_WORLD = 0x5EED
SALT_INIT = 0
SALT_FOOD = 1
SALT_RESPAWN = 2


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment parameters.

    Defaults reproduce the reference configuration: 8x6 chunks of 16 cells of
    1m (mgr.cpp:106-108), 30 food cap (mgr.cpp:111), 32 initial agents
    (training_loop.py:162), 4 species (types.hpp:13), 32-pixel sensor with a
    90-degree FOV split 24 forward / 8 backward rays (mgr.hpp:19, sim.cpp:221,
    gfx.cpp:252-253), near sphere 1.1 (mgr.cpp:133).
    """

    num_worlds: int = 2048
    init_agents: int = 32              # initNumAgentsPerWorld
    max_agents: int = 128              # fixed slot capacity (deviation D2)
    num_species: int = 4               # kNumSpecies

    # Geometry
    num_chunks_x: int = 8
    num_chunks_y: int = 6
    chunk_width: int = 16              # ChunkInfo::kChunkWidth
    cell_dim: float = 1.0

    # Food (types.hpp:79-80, mgr.cpp:111)
    max_food_packages: int = 5         # per chunk
    total_allowed_food: int = 30       # per world

    # Combat / lifecycle (sim.cpp:443-444, 536, 547-564)
    shoot_damage: int = 50
    eat_health: int = 20
    breed_min_health: int = 10         # strict >, sim.cpp:547
    breed_cost: int = 40
    child_health: int = 50
    init_health: int = 100

    # Movement (sim.cpp:456-475)
    rotation_delta: float = 0.1
    move_speed: float = 1.0

    # Sensor (SPEC.md "Sensor pass"; deviation D7)
    sensor_size: int = 32
    fov_degrees: float = 90.0
    near: float = 1.1
    agent_radius: float = 1.0

    # Learner-side dims (training_loop.py:230-233)
    hidden_state_dim: int = 16         # kHiddenStateDim

    reward_setting: RewardSetting = RewardSetting.SETTING_8

    # Reference-bug emulation toggles (SPEC.md deviations; default = fixed).
    # Each is mirrored in the oracle and covered by tests/test_quirks.py —
    # together with the manager's quirk_compat (Q1/Q2 export quirks) they
    # reproduce the reference's exact behavior for side-by-side experiments.
    quirk_d1_stale_finder: bool = False   # shoot/breed ignore target-alive (stale handle UB, sim.cpp:434-454, 547-569)
    quirk_d3_oob_reward: bool = False     # reward reads rewards[min(species, NS-1)] (OOB read emulation, sim.cpp:943)
    quirk_d4_shift_typo: bool = False     # shift copies hitFriendly into prev.hitEnemy (sim.cpp:1034)

    # --- derived ---

    @property
    def world_lim_x(self) -> float:
        return self.num_chunks_x * self.chunk_width * self.cell_dim

    @property
    def world_lim_y(self) -> float:
        return self.num_chunks_y * self.chunk_width * self.cell_dim

    @property
    def num_chunks(self) -> int:
        return self.num_chunks_x * self.num_chunks_y

    @property
    def num_forward_rays(self) -> int:
        return 3 * self.sensor_size // 4

    @property
    def num_backward_rays(self) -> int:
        return self.sensor_size // 4

    @property
    def max_range(self) -> float:
        return math.hypot(self.world_lim_x, self.world_lim_y)

    @property
    def respawn_floor(self) -> int:
        """Per-species population floor: init_agents / num_species (sim.cpp:801-802)."""
        return self.init_agents // self.num_species

    @property
    def obs_dim(self) -> int:
        """Flat obs: depth + health + pos + semantic + surrounding (util.py:14-29)."""
        return self.sensor_size + 1 + 2 + self.sensor_size + 2

    def __post_init__(self):
        assert self.sensor_size % 4 == 0, "ray fan split requires sensor_size % 4 == 0"
        assert self.max_agents >= self.init_agents
        assert self.init_agents % self.num_species == 0
        # Species-class slot quota (SPEC deviation D2b): slot i belongs to
        # species (i % num_species) + 1 for its whole lifetime, so each
        # species' agents form a contiguous strided view — per-species
        # learner batches need no gather/sort and carry 1/num_species of the
        # rows.
        assert self.max_agents % self.num_species == 0

    @property
    def agents_per_species(self) -> int:
        """Per-species slot quota (deviation D2b)."""
        return self.max_agents // self.num_species
