"""ScriptBotsViewer — parity surface for the reference viewer class.

Mirrors the nanobind `ScriptBotsViewer` (src/entry/entry.cpp:47-80):
constructor `(gpu_id, num_worlds, rand_seed, init_num_agents_per_world,
window_width, window_height)`, `loop(num_epochs, step_fn, carry)`, and
`get_sim_mgr()`. The Vulkan window + ImGui raycast panel (src/gfx/gfx.cpp)
become a matplotlib figure; with an interactive backend the reference's
keyboard control scheme works (gfx.cpp:176-205): W/S forward/backward,
R/F rotate left/right, SPACE shoot, B breed, arrow keys switch the
inspected agent/world. Headless (Agg), `loop` saves periodic PNG frames
instead — observability without a GPU windowing stack.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import numpy as np

from madrona_bots_tpu.api.manager import SimManager
from madrona_bots_tpu.viz.render import (render_sensor_strip, render_world)


class ScriptBotsViewer:
    def __init__(self, gpu_id: int, num_worlds: int, rand_seed: int,
                 init_num_agents_per_world: int,
                 window_width: int = 1375, window_height: int = 768,
                 frame_dir: str = "viewer_frames", frame_every: int = 10,
                 **mgr_kwargs):
        self.sim_mgr = SimManager(gpu_id, num_worlds, rand_seed,
                                  init_num_agents_per_world, **mgr_kwargs)
        self.window = (window_width, window_height)
        self.frame_dir = frame_dir
        self.frame_every = frame_every
        self.inspect_world = 0
        self.inspect_agent = 0
        self._keys = set()
        self._fig = None

    def get_sim_mgr(self) -> SimManager:
        return self.sim_mgr

    # -- input handling (keyboard scheme of gfx.cpp:176-205) --------------

    def _on_key(self, event):
        k = (event.key or "").lower()
        if k == "right":
            self.inspect_agent += 1
        elif k == "left":
            self.inspect_agent = max(0, self.inspect_agent - 1)
        elif k == "up":
            self.inspect_world = min(self.sim_mgr.cfg.num_worlds - 1,
                                     self.inspect_world + 1)
        elif k == "down":
            self.inspect_world = max(0, self.inspect_world - 1)
        else:
            self._keys.add(k)

    def _selected_slot(self):
        """inspect_agent = index into the inspected world's ALIVE agents
        (clamped); returns the capacity slot, so rendering and keyboard
        control target the SAME agent."""
        import numpy as np
        alive = np.asarray(self.sim_mgr.state.alive[self.inspect_world])
        slots = np.flatnonzero(alive)
        if slots.size == 0:
            return 0
        self.inspect_agent = min(max(self.inspect_agent, 0), slots.size - 1)
        return int(slots[self.inspect_agent])

    def _apply_keys(self):
        if not self._keys:
            return
        mgr = self.sim_mgr
        self._selected_slot()  # clamps inspect_agent to the alive count
        offset = mgr.agent_offset_for_world(self.inspect_world)
        sensor_idx = mgr.sensor_index_tensor().to_numpy()
        row = int(sensor_idx[offset + self.inspect_agent, 0])
        k = self._keys
        mgr.set_action(row,
                       forward=int("w" in k), backward=int("s" in k),
                       rotate_left=int("r" in k), rotate_right=int("f" in k),
                       shoot=int(" " in k or "space" in k),
                       breed=int("b" in k))
        self._keys.clear()

    # -- main loop ---------------------------------------------------------

    def loop(self, num_epochs: int, step_fn: Callable[[int, Any], None],
             carry: Any = None, print_freq: int = 10):
        import matplotlib
        interactive = matplotlib.get_backend().lower() not in (
            "agg", "pdf", "svg", "ps")
        import matplotlib.pyplot as plt

        if interactive:
            self._fig = plt.figure(
                figsize=(self.window[0] / 110, self.window[1] / 110))
            gs = self._fig.add_gridspec(8, 1)
            self._ax = self._fig.add_subplot(gs[:6])
            self._axd = self._fig.add_subplot(gs[6])
            self._axs = self._fig.add_subplot(gs[7])
            self._fig.canvas.mpl_connect("key_press_event", self._on_key)
            plt.ion()
            plt.show(block=False)
        else:
            os.makedirs(self.frame_dir, exist_ok=True)

        for epoch in range(1, num_epochs + 1):
            if epoch % print_freq == 0 or epoch == 1:
                print("Relative Epoch ", epoch)
            self._apply_keys()
            step_fn(epoch, carry)
            if interactive:
                self._draw()
                self._fig.canvas.draw_idle()
                self._fig.canvas.flush_events()
            elif epoch % self.frame_every == 0 or epoch == 1:
                from madrona_bots_tpu.viz.render import save_frame
                save_frame(self.sim_mgr.state, self.inspect_world,
                           self.sim_mgr.cfg,
                           os.path.join(self.frame_dir, f"epoch_{epoch:06d}.png"),
                           agent_slot=self._selected_slot())

    def _draw(self):
        cfg = self.sim_mgr.cfg
        slot = self._selected_slot()
        render_world(self._ax, self.sim_mgr.state, self.inspect_world, cfg,
                     selected_agent=slot)
        render_sensor_strip(self._axd, self._axs, self.sim_mgr.state,
                            self.inspect_world, slot, cfg)
