"""SimManager — drop-in parity surface for the `madrona_bots` Python module.

Mirrors the nanobind class from the reference (src/entry/entry.cpp:16-45 and
src/entry/mgr.cpp:199-422): `SimManager(gpu_id, num_worlds, rand_seed,
init_num_agents_per_world)`, `step()`, `shift_observations()`, and the 11
tensor getters, with tensors in the reference's species-major global row
order (the cross-world SpeciesObservation sort, sim.cpp:1148-1149 — here a
deterministic (species, world, slot) ordering).

The hot path stays on device: `step()` is the jitted env step. The compacted
"exported tensors" are host-side views materialized lazily on access —
exactly the role of the reference's zero-copy torch exports, minus the sort.
Writes to `action_tensor()` / `hidden_state_tensor()` buffers are staged and
scattered back into the padded device state at the next `step()` (the
reference's exported-buffer write pattern, training_loop.py:136-137).

For peak throughput skip this class and use `learn.a2c.make_train_tick` —
the fully fused on-device loop with no compaction at all.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.state import WorldState, init_state


class Tensor:
    """Host view of an exported buffer (stands in for ma::py::Tensor +
    .to_torch(), mgr.cpp:70-76). Mutations are visible to the manager (the
    staging arrays are shared), mirroring the reference's zero-copy writes."""

    def __init__(self, array: np.ndarray):
        self._array = array

    def to_torch(self):
        import torch
        return torch.from_numpy(self._array)

    def to_jax(self) -> jax.Array:
        return jnp.asarray(self._array)

    def to_numpy(self) -> np.ndarray:
        return self._array

    @property
    def shape(self):
        return self._array.shape

    def __array__(self, dtype=None):
        return np.asarray(self._array, dtype=dtype)


class SimManager:
    """Parity constructor signature: entry.cpp:17-32. `gpu_id` selects a JAX
    device index (kept for signature parity)."""

    def __init__(self, gpu_id: int, num_worlds: int, rand_seed: int,
                 init_num_agents_per_world: int,
                 env_config: Optional[EnvConfig] = None,
                 quirk_compat: bool = False,
                 use_pallas: Optional[bool] = None):
        if env_config is None:
            env_config = EnvConfig(num_worlds=num_worlds,
                                   init_agents=init_num_agents_per_world)
        else:
            assert env_config.num_worlds == num_worlds
            assert env_config.init_agents == init_num_agents_per_world, (
                env_config.init_agents, init_num_agents_per_world)
        self.cfg = env_config
        self.quirk_compat = quirk_compat
        if use_pallas is None:
            # Pallas sensor on accelerators; jnp reference path on CPU
            # (where the kernel would run interpreted).
            use_pallas = jax.devices()[0].platform != "cpu"
        self.use_pallas = use_pallas
        del gpu_id  # device placement is JAX's default device
        self.state: WorldState = init_state(jax.random.key(rand_seed), self.cfg)
        self._cache: Dict[str, np.ndarray] = {}
        self._perm: Optional[np.ndarray] = None          # species-major order
        self._perm_world: Optional[np.ndarray] = None    # world-major order
        # Persistent writable export buffers (capacity rows). Allocated on
        # first export and kept alive for the run: a tensor fetched once
        # stays valid across step() like the reference's device buffers —
        # reads show current sim values (refreshed each step in the new
        # export order), writes are flushed into the sim at the next
        # step()/shift_observations().
        self._action_buf: Optional[np.ndarray] = None
        self._hidden_buf: Optional[np.ndarray] = None
        self._recompute_order()

    # ------------------------------------------------------------------
    # Stepping (Manager::step, mgr.cpp:51-63)
    # ------------------------------------------------------------------

    def step(self):
        self._flush_writes()
        self.state = env_mod.step(self.state, self.cfg, self.use_pallas)
        self._recompute_order()
        self._refresh_exports()

    def shift_observations(self):
        self._flush_writes()
        self.state = env_mod.shift_observations(self.state, self.cfg)
        self._cache.clear()
        self._refresh_exports()

    # ------------------------------------------------------------------
    # Export order
    # ------------------------------------------------------------------

    def _recompute_order(self):
        # Species-major across all worlds (the reference's global sort);
        # within species: (world, slot) ascending. Runs through the native
        # C++ data plane (native/mbots_host.cpp) when built, with a numpy
        # fallback inside utils.native.
        from madrona_bots_tpu.utils import native
        alive2 = np.asarray(self.state.alive)
        species2 = np.asarray(self.state.species)
        self._perm, self._species_starts = native.compaction(
            alive2, species2, self.cfg.num_species)
        self._perm_world = np.flatnonzero(alive2.reshape(-1))
        self._cache.clear()

    @property
    def total_num_agents(self) -> int:
        """SimBridge::totalNumAgents (sim.hpp:74-78)."""
        return int(self._perm.shape[0])

    def agent_offset_for_world(self, world_idx: int) -> int:
        """World-major row offset (Manager::agentOffsetForWorld, mgr.cpp:274;
        the SimBridge agentWorldOffsets readback, mgr.cpp:57-62)."""
        from madrona_bots_tpu.utils import native
        offsets, _ = native.world_offsets(np.asarray(self.state.alive))
        return int(offsets[world_idx])

    def species_offsets(self) -> np.ndarray:
        """TRUE per-species start offsets into the exported rows, [NS+1].

        The reference derives offsets by cumsum of species_count_tensor
        (training_loop.py:43-45), which undercounts when respawns happened
        this tick (they are in the rows but not the counts — SPEC §6). This
        helper gives exact boundaries; prefer it in new code.
        """
        return self._species_starts

    # ------------------------------------------------------------------
    # Tensor getters (mgr.cpp:199-422)
    # ------------------------------------------------------------------

    def _gather(self, name: str, field: np.ndarray, dtype=None) -> Tensor:
        if name not in self._cache:
            from madrona_bots_tpu.utils import native
            out = native.gather_rows(
                field.reshape((-1,) + field.shape[2:]), self._perm)
            if dtype is not None:
                out = np.ascontiguousarray(out.astype(dtype))
            self._cache[name] = out
        return Tensor(self._cache[name])

    def depth_tensor(self, is_prev: bool = False) -> Tensor:
        """uint8 [N, sensor]. Deviation D5: the real depth buffer (the
        reference exports the semantic buffer under this name, sim.cpp:98-104);
        quirk_compat=True restores the reference behavior."""
        s = self.state
        if self.quirk_compat:
            src = s.prev_sensor_semantic if is_prev else s.sensor_semantic
            return self._gather(f"depthQ{is_prev}", np.asarray(src), np.uint8)
        src = s.prev_sensor_depth if is_prev else s.sensor_depth
        return self._gather(f"depth{is_prev}", np.asarray(src))

    def semantic_tensor(self, is_prev: bool = False) -> Tensor:
        s = self.state
        src = s.prev_sensor_semantic if is_prev else s.sensor_semantic
        return self._gather(f"semantic{is_prev}", np.asarray(src))

    def reward_tensor(self, is_prev: bool = False) -> Tensor:
        s = self.state
        src = s.prev_reward if is_prev else s.reward
        return self._gather(f"reward{is_prev}", np.asarray(src)[..., None])

    def species_count_tensor(self) -> Tensor:
        """[num_worlds, num_species] int32 — pre-respawn tracker counts."""
        return Tensor(np.asarray(self.state.species_counts))

    def position_tensor(self, is_prev: bool = False) -> Tensor:
        s = self.state
        src = s.prev_pos if is_prev else s.pos
        return self._gather(f"pos{is_prev}", np.asarray(src))

    def health_tensor(self, is_prev: bool = False) -> Tensor:
        """float32 [N, 1] VALUES (deviation D5: the reference bit-reinterprets
        the int32 storage as float32 — quirk Q2, mgr.cpp:329-346);
        quirk_compat=True restores the bit-reinterpretation."""
        s = self.state
        src = s.prev_health if is_prev else s.health
        if self.quirk_compat:
            raw = self._gather(f"healthQ{is_prev}", np.asarray(src)[..., None])
            return Tensor(raw.to_numpy().astype(np.int32).view(np.float32))
        return self._gather(f"health{is_prev}",
                            np.asarray(src)[..., None], np.float32)

    def surrounding_tensor(self, is_prev: bool = False) -> Tensor:
        s = self.state
        src = s.prev_surrounding if is_prev else s.surrounding
        return self._gather(f"surrounding{is_prev}", np.asarray(src))

    def action_tensor(self, is_prev: bool = False) -> Tensor:
        if is_prev:
            return self._gather("actionP", np.asarray(self.state.prev_action))
        if self._action_buf is None:
            W, A = self.cfg.num_worlds, self.cfg.max_agents
            self._action_buf = np.zeros((W * A, NUM_ACTIONS), np.int32)
            self._action_buf[: self.total_num_agents] = np.asarray(
                self.state.action).reshape(-1, NUM_ACTIONS)[self._perm]
        return Tensor(self._action_buf[: self.total_num_agents])

    def stats_tensor(self, is_prev: bool = False) -> Tensor:
        s = self.state
        src = s.prev_stats if is_prev else s.stats
        return self._gather(f"stats{is_prev}", np.asarray(src))

    def hidden_state_tensor(self, is_prev: bool = False) -> Tensor:
        if is_prev:
            return self._gather("hiddenP", np.asarray(self.state.prev_hidden))
        if self._hidden_buf is None:
            W, A = self.cfg.num_worlds, self.cfg.max_agents
            H = self.cfg.hidden_state_dim
            self._hidden_buf = np.zeros((W * A, H), np.float32)
            self._hidden_buf[: self.total_num_agents] = np.asarray(
                self.state.hidden).reshape(-1, H)[self._perm]
        return Tensor(self._hidden_buf[: self.total_num_agents])

    def done_tensor(self) -> Tensor:
        """Always zeros: worlds never reset (quirk Q7, sim.cpp:302-305)."""
        return Tensor(np.zeros((self.total_num_agents, 1), np.int32))

    def sensor_index_tensor(self) -> Tensor:
        """[N_world_major, 1] int32: world-major agent index -> exported row
        (the SensorOutputIndex indirection, sim.cpp:736-789)."""
        from madrona_bots_tpu.utils import native
        inv = native.inverse_perm(self._perm,
                                  self.cfg.num_worlds * self.cfg.max_agents)
        return Tensor(inv[self._perm_world][:, None].astype(np.int32))

    def set_action(self, agent_idx: int, forward: int, backward: int,
                   rotate_left: int, rotate_right: int, shoot: int, breed: int):
        """Write one agent's action by exported row (Manager::setAction,
        mgr.cpp:251-272)."""
        buf = self.action_tensor(False).to_numpy()
        buf[agent_idx] = [forward, backward, rotate_left, rotate_right,
                         shoot, breed]

    # ------------------------------------------------------------------
    # Write-back
    # ------------------------------------------------------------------

    def _flush_writes(self):
        """Scatter the persistent export buffers back into the padded state
        (the reference's exported-buffer write pattern: anything written into
        action/hidden tensors since the last step reaches the sim here)."""
        from madrona_bots_tpu.utils import native
        W, A = self.cfg.num_worlds, self.cfg.max_agents
        n = self.total_num_agents
        if self._action_buf is not None:
            flat = np.zeros((W * A, NUM_ACTIONS), np.int32)
            native.scatter_rows(self._action_buf[:n], self._perm, flat)
            self.state = self.state.replace(
                action=jnp.asarray(flat.reshape(W, A, NUM_ACTIONS)))
        if self._hidden_buf is not None:
            flat = np.zeros((W * A, self.cfg.hidden_state_dim), np.float32)
            native.scatter_rows(self._hidden_buf[:n], self._perm, flat)
            self.state = self.state.replace(
                hidden=jnp.asarray(flat.reshape(W, A, self.cfg.hidden_state_dim)))

    def _refresh_exports(self):
        """Re-fill the persistent export buffers from the new state in the
        new export order, so tensors fetched once stay live across steps."""
        from madrona_bots_tpu.utils import native
        n = self.total_num_agents
        if self._action_buf is not None:
            self._action_buf[:n] = native.gather_rows(
                np.asarray(self.state.action).reshape(-1, NUM_ACTIONS),
                self._perm)
        if self._hidden_buf is not None:
            self._hidden_buf[:n] = native.gather_rows(
                np.asarray(self.state.hidden).reshape(
                    -1, self.cfg.hidden_state_dim), self._perm)
