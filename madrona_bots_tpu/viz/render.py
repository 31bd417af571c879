"""World + sensor rendering (matplotlib).

Replaces the reference's Vulkan viewer and ImGui raycast panel
(src/gfx/gfx.cpp:214-318) with a portable renderer: top-down arena view
(agents colored by species with heading ticks, food markers, chunk grid) and
the per-agent sensor strip — depth as a grayscale row and semantics as a
color row, split 24 forward / 8 backward rays exactly like the reference
panel (gfx.cpp:252-253).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from madrona_bots_tpu.config import EnvConfig

SPECIES_COLORS = np.array([
    [0.55, 0.55, 0.55],   # 0: unused / wall
    [0.90, 0.30, 0.25],   # species 1
    [0.25, 0.60, 0.90],   # species 2
    [0.35, 0.80, 0.35],   # species 3
    [0.95, 0.75, 0.20],   # species 4
])


def semantic_to_rgb(semantic: np.ndarray) -> np.ndarray:
    """[S] int8 -> [S, 3] float colors. -1 (no hit) is near-black; 0 = wall."""
    out = np.zeros(semantic.shape + (3,), np.float32)
    out[semantic < 0] = [0.08, 0.08, 0.08]
    for v in range(0, 5):
        out[semantic == v] = SPECIES_COLORS[v]
    return out


def render_world(ax, state, world_idx: int, cfg: EnvConfig,
                 selected_agent: Optional[int] = None):
    """Draw one world's top-down view onto a matplotlib Axes."""
    ax.clear()
    ax.set_xlim(0, cfg.world_lim_x)
    ax.set_ylim(0, cfg.world_lim_y)
    ax.set_aspect("equal")
    ax.set_facecolor("#101010")
    cw = cfg.chunk_width * cfg.cell_dim
    for i in range(1, cfg.num_chunks_x):
        ax.axvline(i * cw, color="#222222", lw=0.5)
    for j in range(1, cfg.num_chunks_y):
        ax.axhline(j * cw, color="#222222", lw=0.5)

    food_count = np.asarray(state.food_count[world_idx])      # [C, P]
    food_cell = np.asarray(state.food_cell[world_idx])        # [C, P, 2]
    for c in range(cfg.num_chunks):
        cx0 = (c % cfg.num_chunks_x) * cfg.chunk_width
        cy0 = (c // cfg.num_chunks_x) * cfg.chunk_width
        for p in range(cfg.max_food_packages):
            if food_count[c, p] > 0:
                fx = (cx0 + food_cell[c, p, 0]) * cfg.cell_dim
                fy = (cy0 + food_cell[c, p, 1]) * cfg.cell_dim
                ax.plot(fx, fy, marker="s", ms=4, color="#d0f0a0")

    alive = np.asarray(state.alive[world_idx])
    pos = np.asarray(state.pos[world_idx])
    heading = np.asarray(state.heading[world_idx])
    species = np.asarray(state.species[world_idx])
    for a in np.where(alive)[0]:
        col = SPECIES_COLORS[species[a]]
        circ = __import__("matplotlib.patches", fromlist=["Circle"]).Circle(
            pos[a], cfg.agent_radius, color=col,
            ec="white" if a == selected_agent else None, lw=1.5)
        ax.add_patch(circ)
        tip = pos[a] + cfg.agent_radius * 1.6 * np.array(
            [np.cos(heading[a]), np.sin(heading[a])])
        ax.plot([pos[a][0], tip[0]], [pos[a][1], tip[1]], color=col, lw=1.2)
    ax.set_xticks([])
    ax.set_yticks([])


def render_sensor_strip(ax_depth, ax_sem, state, world_idx: int,
                        agent_slot: int, cfg: EnvConfig):
    """Draw the reference's raycast panel rows for one agent: depth grayscale
    + semantic colors, forward rays on top, backward below."""
    nf = cfg.num_forward_rays
    depth = np.asarray(state.sensor_depth[world_idx, agent_slot])
    sem = np.asarray(state.sensor_semantic[world_idx, agent_slot])

    dimg = np.zeros((2, nf), np.float32)
    dimg[0, :] = depth[:nf] / 255.0
    dimg[1, : cfg.num_backward_rays] = depth[nf:] / 255.0
    ax_depth.clear()
    ax_depth.imshow(dimg, cmap="gray", vmin=0, vmax=1, aspect="auto",
                    interpolation="nearest")
    ax_depth.set_title("depth", fontsize=7)
    ax_depth.set_xticks([])
    ax_depth.set_yticks([])

    simg = np.zeros((2, nf, 3), np.float32)
    simg[0] = semantic_to_rgb(sem[:nf])
    simg[1, : cfg.num_backward_rays] = semantic_to_rgb(sem[nf:])
    ax_sem.clear()
    ax_sem.imshow(simg, aspect="auto", interpolation="nearest")
    ax_sem.set_title("semantic", fontsize=7)
    ax_sem.set_xticks([])
    ax_sem.set_yticks([])


def save_frame(state, world_idx: int, cfg: EnvConfig, path: str,
               agent_slot: int = 0):
    """Headless one-shot render to a PNG (world + sensor strips)."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(8, 7))
    gs = fig.add_gridspec(8, 1)
    ax = fig.add_subplot(gs[:6])
    axd = fig.add_subplot(gs[6])
    axs = fig.add_subplot(gs[7])
    render_world(ax, state, world_idx, cfg, selected_agent=agent_slot)
    render_sensor_strip(axd, axs, state, world_idx, agent_slot, cfg)
    fig.savefig(path, dpi=110, facecolor="#181818")
    plt.close(fig)
    return path
