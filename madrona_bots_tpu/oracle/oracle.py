"""Loop-based single/multi-world oracle — the executable form of SPEC.md.

This is the fixed-seed bit-level anchor the reference lacks (it has no tests
at all — SURVEY.md §4). Every rule is written as explicit Python loops over
agents/packages/species in the priority order SPEC.md freezes, mirroring the
reference systems (/root/reference/src/sim/sim.cpp:307-983) with the
deterministic replacements for its CUDA atomics.

Random draws use *exactly* the same `jax.random` fold_in tree and draw shapes
as the vectorized env, so integer/discrete trajectories must match the jitted
env bit-for-bit; float32 state matches up to XLA fusion differences
(tests/test_oracle_parity.py asserts exact ints and tight float tolerance).

Intentionally simple and slow (a few worlds, tens of steps).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from madrona_bots_tpu.config import (
    ACTION_BACKWARD,
    ACTION_BREED,
    ACTION_FORWARD,
    ACTION_ROTATE_LEFT,
    ACTION_ROTATE_RIGHT,
    ACTION_SHOOT,
    EnvConfig,
    SALT_FOOD,
    SALT_INIT,
    SALT_RESPAWN,
    SALT_WORLD,
)


class OracleWorld:
    """State of one world, plain numpy."""

    def __init__(self, cfg: EnvConfig, world_key):
        A = cfg.max_agents
        self.cfg = cfg
        self.key = world_key
        self.pos = np.zeros((A, 2), np.float32)
        self.heading = np.zeros(A, np.float32)
        self.health = np.zeros(A, np.int32)
        self.alive = np.zeros(A, bool)
        self.species = np.zeros(A, np.int32)
        self.stats = np.zeros((A, 4), np.int32)
        self.surrounding = np.zeros((A, 2), np.float32)
        self.reward = np.zeros(A, np.float32)
        self.finder = np.full(A, -1, np.int32)
        self.sensor_depth = np.zeros((A, cfg.sensor_size), np.uint8)
        self.sensor_semantic = np.full((A, cfg.sensor_size), -1, np.int8)
        self.prev_sensor_depth = np.zeros((A, cfg.sensor_size), np.uint8)
        self.prev_sensor_semantic = np.full((A, cfg.sensor_size), -1, np.int8)
        self.food_count = np.zeros((cfg.num_chunks, cfg.max_food_packages), np.int32)
        self.food_cell = np.zeros((cfg.num_chunks, cfg.max_food_packages, 2), np.int32)
        self.num_food = 0
        self.species_counts = np.zeros(cfg.num_species, np.int32)
        self.species_rewards = np.zeros(cfg.num_species, np.float32)
        self.t = 0
        # Action/hidden buffers + Prev* twins (same init as state.init_state;
        # prev twins move on shift_observations, get zeroed for dead/new
        # slots inside step — SPEC §4.6 / env.step_systems).
        H = cfg.hidden_state_dim
        self.action = np.zeros((A, 6), np.int32)
        self.hidden = np.zeros((A, H), np.float32)
        self.prev_action = np.zeros((A, 6), np.int32)
        self.prev_hidden = np.zeros((A, H), np.float32)
        self.prev_surrounding = np.zeros((A, 2), np.float32)
        self.prev_reward = np.zeros(A, np.float32)
        self.prev_stats = np.zeros((A, 4), np.int32)

        # initWorld (sim.cpp:233-275): same batched draw as state.init_state.
        k = jax.random.fold_in(world_key, SALT_INIT)
        u = np.asarray(jax.random.uniform(k, (A, 2), jnp.float32))
        lims = np.array([cfg.world_lim_x, cfg.world_lim_y], np.float32)
        for i in range(cfg.init_agents):
            self.alive[i] = True
            self.species[i] = (i % cfg.num_species) + 1
            self.pos[i] = (u[i] * lims).astype(np.float32)
            self.health[i] = cfg.init_health
        self.prev_species = self.species.copy()
        self.prev_pos = self.pos.copy()
        self.prev_health = self.health.copy()

    # -- helpers --------------------------------------------------------

    def chunk_index(self, p) -> int:
        """float32 arithmetic like env.systems.chunk_index — python-float
        division would run in float64 and can floor differently for
        non-power-of-two cell_dim."""
        cfg = self.cfg
        cx = math.floor(np.float32(np.float32(p[0]) / np.float32(cfg.cell_dim))
                        / np.float32(cfg.chunk_width))
        cy = math.floor(np.float32(np.float32(p[1]) / np.float32(cfg.cell_dim))
                        / np.float32(cfg.chunk_width))
        cx = min(max(cx, 0), cfg.num_chunks_x - 1)
        cy = min(max(cy, 0), cfg.num_chunks_y - 1)
        return int(cx + cy * cfg.num_chunks_x)

    def cell_in_chunk(self, p):
        cfg = self.cfg
        out = []
        for ax in range(2):
            ch = np.float32(p[ax]) / np.float32(cfg.cell_dim) / np.float32(cfg.chunk_width)
            frac = ch - np.float32(math.floor(ch))
            out.append(int(np.float32(cfg.chunk_width) * frac))
        return out

    def _free_slots_ascending(self, free_mask):
        return [i for i in range(self.cfg.max_agents) if free_mask[i]]

    # -- one step (SPEC.md order) ---------------------------------------

    def step(self, actions: np.ndarray):
        """actions: [A, 6] int32. Mirrors env.step_systems + sensor_pass."""
        cfg = self.cfg
        A = cfg.max_agents
        t = self.t
        alive0 = self.alive.copy()
        act = actions > 0

        # --- food spawn ---
        k = jax.random.fold_in(jax.random.fold_in(self.key, t), SALT_FOOD)
        gate = int(jax.random.randint(jax.random.fold_in(k, 0), (), 0, 10))
        n = int(jax.random.randint(jax.random.fold_in(k, 1), (), 1, 3))
        hi = jnp.array([cfg.num_chunks_x, cfg.num_chunks_y,
                        cfg.chunk_width, cfg.chunk_width])
        n_eff = min(n, max(cfg.total_allowed_food - self.num_food, 0))
        for j in range(2):
            per = np.asarray(jax.random.randint(
                jax.random.fold_in(k, 2 + j), (4,), 0, hi))
            if gate != 0 or j >= n_eff:
                continue
            c = int(per[0] + per[1] * cfg.num_chunks_x)
            placed = False
            for p in range(cfg.max_food_packages):
                if self.food_count[c, p] == 0:
                    self.food_count[c, p] = 1
                    self.food_cell[c, p] = [int(per[2]), int(per[3])]
                    placed = True
                    break
            if placed:
                self.num_food += 1

        # --- action system ---
        damage = np.zeros(A, np.int32)
        hit_friendly = np.zeros(A, bool)
        hit_enemy = np.zeros(A, bool)
        chunk_agents = np.zeros(cfg.num_chunks, np.int32)
        chunk_speed = np.zeros(cfg.num_chunks, np.int32)
        for a in range(A):
            if not alive0[a]:
                continue
            tgt = int(self.finder[a])
            if (act[a, ACTION_SHOOT] and tgt >= 0
                    and (alive0[tgt] or cfg.quirk_d1_stale_finder)):
                damage[tgt] += cfg.shoot_damage
                if self.species[tgt] == self.species[a]:
                    hit_friendly[a] = True
                else:
                    hit_enemy[a] = True
            if act[a, ACTION_ROTATE_LEFT]:
                self.heading[a] = np.float32(self.heading[a] + np.float32(cfg.rotation_delta))
            elif act[a, ACTION_ROTATE_RIGHT]:
                self.heading[a] = np.float32(self.heading[a] - np.float32(cfg.rotation_delta))
            old = self.pos[a].copy()
            # trig via XLA so the scalar path matches the vectorized env
            ch, sh = _cos_sin(self.heading[a])
            mv = np.float32(0.0)
            if act[a, ACTION_FORWARD]:
                mv = np.float32(cfg.move_speed)
            elif act[a, ACTION_BACKWARD]:
                mv = np.float32(-cfg.move_speed)
            p = self.pos[a]
            p[0] = np.float32(p[0] + ch * mv)
            p[1] = np.float32(p[1] + sh * mv)
            p[0] = min(np.float32(cfg.world_lim_x - 1.0), max(np.float32(0.0), p[0]))
            p[1] = min(np.float32(cfg.world_lim_y - 1.0), max(np.float32(0.0), p[1]))
            d = p - old
            dl = np.float32(np.sqrt(np.float32(d[0] * d[0] + d[1] * d[1])))
            c = self.chunk_index(p)
            chunk_agents[c] += 1
            chunk_speed[c] += int(np.float32(dl * 2.0))

        # --- health sync ---
        for a in range(A):
            if alive0[a]:
                self.health[a] -= damage[a]
        ate = np.zeros(A, bool)
        for p in range(cfg.max_food_packages):
            # contenders per chunk, lowest slot wins
            winners = {}
            for a in range(A):
                if not alive0[a] or ate[a]:
                    continue
                c = self.chunk_index(self.pos[a])
                if self.food_count[c, p] <= 0:
                    continue
                if self.cell_in_chunk(self.pos[a]) == list(self.food_cell[c, p]):
                    if c not in winners:
                        winners[c] = a  # ascending a => first is lowest
            for c, a in winners.items():
                ate[a] = True
                self.health[a] += cfg.eat_health
                self.food_count[c, p] = 0
                self.num_food -= 1

        breeder = np.zeros(A, bool)
        for a in range(A):
            if not alive0[a]:
                continue
            tgt = int(self.finder[a])
            if (act[a, ACTION_BREED] and self.health[a] > cfg.breed_min_health
                    and tgt >= 0
                    and (alive0[tgt] or cfg.quirk_d1_stale_finder)
                    and self.species[tgt] == self.species[a]):
                breeder[a] = True
                self.health[a] -= cfg.breed_cost

        died = alive0 & (self.health <= 0)
        alive1 = alive0 & ~died

        # births: free-at-step-start slots OF THE PARENT'S SPECIES CLASS
        # (slot i belongs to species (i % NS) + 1 — deviation D2b),
        # ascending parent order within each class.
        NS = cfg.num_species
        free_by_class = {
            c: [i for i in range(A) if not alive0[i] and i % NS == c]
            for c in range(NS)
        }
        fi_by_class = {c: 0 for c in range(NS)}
        born = np.zeros(A, bool)
        for a in range(A):
            if not breeder[a]:
                continue
            cls = int(self.species[a]) - 1
            free = free_by_class[cls]
            fi = fi_by_class[cls]
            if fi < len(free):
                c = free[fi]
                fi_by_class[cls] = fi + 1
                born[c] = True
                self.pos[c] = self.pos[a].copy()
                self.heading[c] = 0.0
                self.species[c] = self.species[a]
                self.health[c] = cfg.child_health
        alive2 = alive1 | born

        # --- surrounding observation ---
        for a in range(A):
            if not alive2[a]:
                self.surrounding[a] = 0.0
                continue
            self.surrounding[a] = _bilinear(self.pos[a], chunk_agents, chunk_speed, cfg)

        # --- species info + respawn ---
        counts = np.zeros(cfg.num_species, np.int32)
        total_health = np.zeros(cfg.num_species, np.int64)
        for a in range(A):
            if alive2[a]:
                s = self.species[a] - 1
                counts[s] += 1
                total_health[s] += self.health[a]
        rewards = np.zeros(cfg.num_species, np.float32)
        for s in range(cfg.num_species):
            avg = np.float32(total_health[s]) / np.float32(counts[s]) if counts[s] > 0 else np.float32(0)
            rewards[s] = np.float32(
                np.float32(counts[s]) / np.float32(cfg.init_agents)
                + avg / np.float32(100.0) - np.float32(2.0))
        self.species_counts = counts.copy()
        self.species_rewards = rewards.copy()

        respawned = np.zeros(A, bool)
        floor_n = cfg.respawn_floor
        base = jax.random.fold_in(jax.random.fold_in(self.key, t), SALT_RESPAWN)
        lims = np.array([cfg.world_lim_x, cfg.world_lim_y], np.float32)
        for s in range(cfg.num_species):
            if counts[s] >= floor_n:
                continue
            # free-at-step-start, not claimed by a birth, of species class s
            # (deviation D2b).
            free2 = [i for i in range(A)
                     if (not alive0[i]) and (not born[i]) and i % NS == s]
            draws = np.asarray(jax.random.uniform(
                jax.random.fold_in(base, s), (floor_n, 2), jnp.float32)) * lims
            fi = 0
            for e in range(floor_n - counts[s]):
                if fi >= len(free2):
                    break
                c = free2[fi]
                fi += 1
                respawned[c] = True
                self.pos[c] = draws[e].astype(np.float32)
                self.heading[c] = 0.0
                self.species[c] = s + 1
                self.health[c] = cfg.init_health
        alive3 = alive2 | respawned
        new_mask = born | respawned

        # --- stats (this step's event flags; new agents have none) ---
        stats = np.zeros((A, 4), np.int32)
        for a in range(A):
            # dead rows are destroyed in the reference -> canonical zeros
            if new_mask[a] or not alive3[a]:
                continue
            stats[a] = [int(hit_friendly[a]), int(hit_enemy[a]),
                        int(ate[a]), int(breeder[a])]

        # --- reward (setting from cfg; rewards[species-1], deviation D3) ---
        for a in range(A):
            if not alive3[a]:
                self.reward[a] = 0.0
                continue
            self.reward[a] = _reward(self, a, stats[a], rewards, cfg)

        # --- prev-sensor shift ---
        for a in range(A):
            if alive3[a] and not new_mask[a]:
                self.prev_sensor_depth[a] = self.sensor_depth[a]
                self.prev_sensor_semantic[a] = self.sensor_semantic[a]
            else:
                self.prev_sensor_depth[a] = 0
                self.prev_sensor_semantic[a] = -1

        # --- action/hidden buffers: learner writes persist, dead/new slots
        # are zeroed (env.step_systems canonicalization) ---
        self.action = actions.astype(np.int32).copy()
        for a in range(A):
            if new_mask[a] or not alive3[a]:
                self.action[a] = 0
                self.hidden[a] = 0.0
                # Prev twins of fresh/dead slots are zeroed (SPEC §4.6).
                self.prev_species[a] = 0
                self.prev_pos[a] = 0.0
                self.prev_health[a] = 0
                self.prev_surrounding[a] = 0.0
                self.prev_reward[a] = 0.0
                self.prev_action[a] = 0
                self.prev_stats[a] = 0
                self.prev_hidden[a] = 0.0

        # --- canonicalize dead slots ---
        for a in range(A):
            if not alive3[a]:
                self.pos[a] = 0.0
                self.heading[a] = 0.0
                self.health[a] = 0
                self.species[a] = 0
                self.surrounding[a] = 0.0

        self.alive = alive3
        self.stats = stats
        self._new_mask = new_mask
        self.t = t + 1

        # --- sensor pass (independent loop-based raycast, below) ---
        self._sensor_pass()

    def _sensor_pass(self):
        """Independent per-ray/per-target sensor — the double-entry form of
        SPEC.md "Sensor pass" (deviation D7; ray fan per the reference's
        3/4-forward-1/4-back split, gfx.cpp:252-253). Shares NO code with
        env/raycast.py or ops/raycast_pallas.py: geometry is re-derived here
        as explicit loops so a bug in the vectorized implementation cannot
        hide behind "oracle parity". Float discipline: every op is a single
        IEEE f32 mul/add/sub/div/sqrt (bit-equal between numpy and XLA);
        trig routes through XLA (jnp.cos/jnp.sin) because libm ulps differ.

        Semantics: rays hit alive agents (circles of radius agent_radius,
        self excluded) and the 4 arena walls; the nearest hit with t > near
        wins, ties (identical f32 t) going to the lowest target slot. Depth
        byte = 255 - min(255, floor(255*t/max_range)); semantic = species
        of the hit agent, 0 for wall, -1 for none. The finder is the
        nearest agent (walls excluded) along the exact heading ray."""
        cfg = self.cfg
        A = cfg.max_agents
        S = cfg.sensor_size
        f32 = np.float32
        INF = f32(3.0e38)
        nf = 3 * S // 4
        nb = S - nf
        fov = math.radians(cfg.fov_degrees)
        offs = np.array(
            [fov / 2 - fov * (i + 0.5) / nf for i in range(nf)]
            + [math.pi + fov / 2 - fov * (j + 0.5) / nb for j in range(nb)],
            dtype=f32)
        r2 = f32(cfg.agent_radius * cfg.agent_radius)
        near = f32(cfg.near)
        lim = (f32(cfg.world_lim_x), f32(cfg.world_lim_y))
        scale = f32(255.0 / cfg.max_range)

        depth = np.zeros((A, S), np.uint8)
        sem = np.full((A, S), -1, np.int8)
        fnd = np.full(A, -1, np.int32)
        for a in range(A):
            if not self.alive[a]:
                continue
            ang = self.heading[a] + offs                     # f32 adds
            ca = np.asarray(jnp.cos(jnp.asarray(ang)))
            sa = np.asarray(jnp.sin(jnp.asarray(ang)))
            ch, sh = _cos_sin(self.heading[a])
            px, py = self.pos[a, 0], self.pos[a, 1]

            t_min = np.full(S, INF, f32)
            arg = np.full(S, -1, np.int32)
            f_min, f_arg = INF, -1
            for b in range(A):
                if b == a or not self.alive[b]:
                    continue
                ocx = f32(self.pos[b, 0] - px)
                ocy = f32(self.pos[b, 1] - py)
                oc2 = f32(f32(ocx * ocx) + f32(ocy * ocy))
                q = f32(r2 - oc2)
                # fan rays (numpy f32 vector over S: elementwise IEEE ops,
                # bit-equal to any vectorization of the same formulas)
                t_c = ca * ocx + sa * ocy
                disc = t_c * t_c + q
                t_hit = t_c - np.sqrt(np.maximum(disc, f32(0.0)))
                closer = (disc >= 0) & (t_hit > near) & (t_hit < t_min)
                t_min = np.where(closer, t_hit, t_min)
                arg = np.where(closer, np.int32(b), arg)
                # finder (crosshair) ray
                ft_c = f32(f32(ch * ocx) + f32(sh * ocy))
                fdisc = f32(f32(ft_c * ft_c) + q)
                if fdisc >= 0:
                    ft = f32(ft_c - f32(np.sqrt(fdisc)))
                    if ft > near and ft < f_min:
                        f_min, f_arg = ft, b

            p = (px, py)
            for si in range(S):
                d2 = (ca[si], sa[si])
                tw = INF
                for k in range(2):
                    th = f32((lim[k] - p[k]) / d2[k]) if d2[k] > 0 else INF
                    tl = f32(-p[k] / d2[k]) if d2[k] < 0 else INF
                    tw = min(tw, min(th, tl))
                if not tw > near:
                    tw = INF
                agent_wins = t_min[si] < tw
                t = min(t_min[si], tw)
                if t < INF:
                    db = 255 - int(min(f32(np.floor(f32(t * scale))),
                                       f32(255.0)))
                    depth[a, si] = np.uint8(db)
                    sem[a, si] = (np.int8(self.species[arg[si]])
                                  if agent_wins else 0)
            fnd[a] = f_arg if f_min < INF else -1

        self.sensor_depth = depth
        self.sensor_semantic = sem
        self.finder = fnd


def _cos_sin(h):
    """Scalar cos/sin through XLA so ulps match the vectorized env."""
    v = jnp.float32(h)
    return np.float32(jnp.cos(v)), np.float32(jnp.sin(v))


def _bilinear(p, chunk_agents, chunk_speed, cfg: EnvConfig):
    cw = np.float32(cfg.chunk_width)
    out = np.zeros(2, np.float32)
    cellx = np.float32(p[0] / np.float32(cfg.cell_dim)) - cw * np.float32(0.5)
    celly = np.float32(p[1] / np.float32(cfg.cell_dim)) - cw * np.float32(0.5)
    chx = np.float32(cellx / cw)
    chy = np.float32(celly / cw)
    fx, fy = np.float32(math.floor(chx)), np.float32(math.floor(chy))
    cx, cy = np.float32(math.ceil(chx)), np.float32(math.ceil(chy))
    xi = np.float32(chx - fx)
    yi = np.float32(chy - fy)

    def tall(x, y):
        x, y = int(x), int(y)
        if x < 0 or y < 0 or x >= cfg.num_chunks_x or y >= cfg.num_chunks_y:
            return np.float32(0), np.float32(0)
        lin = x + y * cfg.num_chunks_x
        return np.float32(chunk_agents[lin]), np.float32(chunk_speed[lin])

    na00, ts00 = tall(fx, fy)
    na10, ts10 = tall(cx, fy)
    na01, ts01 = tall(fx, cy)
    na11, ts11 = tall(cx, cy)
    na_x0 = np.float32(xi * na10 + (np.float32(1.0) - xi) * na00)
    na_x1 = np.float32(xi * na11 + (np.float32(1.0) - xi) * na01)
    ts_x0 = np.float32(xi * ts10 + (np.float32(1.0) - xi) * ts00)
    ts_x1 = np.float32(xi * ts11 + (np.float32(1.0) - xi) * ts01)
    out[0] = np.float32(yi * na_x1 + (np.float32(1.0) - yi) * na_x0)
    out[1] = np.float32(yi * ts_x1 + (np.float32(1.0) - yi) * ts_x0)
    return out


def _reward(w: OracleWorld, a: int, st, sp_rewards, cfg: EnvConfig):
    setting = int(cfg.reward_setting)
    # Quirk D3: the reference reads rewards[speciesID] with speciesID 1..NS
    # (OOB for NS, sim.cpp:943) — emulated as a clamped 0-based read.
    sp_idx = (min(int(w.species[a]), cfg.num_species - 1)
              if cfg.quirk_d3_oob_reward else w.species[a] - 1)
    base = np.float32(sp_rewards[sp_idx]
                      + np.float32(w.health[a]) / np.float32(100.0)
                      - np.float32(0.5))
    hf, he, ate, rp = bool(st[0]), bool(st[1]), bool(st[2]), bool(st[3])
    if setting == 2:
        r = base
        pr = 4.0
        if (w.pos[a][0] < pr or w.pos[a][1] < pr
                or w.pos[a][0] > cfg.world_lim_x - pr
                or w.pos[a][1] > cfg.world_lim_y - pr):
            r = np.float32(r - 1.0)
        r = np.float32(r + 10.0 * rp - 5.0 * hf + 15.0 * he + 7.0 * ate)
    elif setting == 3:
        r = np.float32(10.0 * rp + 15.0 * he + 7.0 * ate)
    elif setting == 4:
        r = np.float32(10.0 * rp + 15.0 * he - 5.0 * hf + 7.0 * ate)
    elif setting == 5:
        r = base
    elif setting == 6:
        r = np.float32(base + 10.0 * ate)
    elif setting == 7:
        r = np.float32(base + 10.0 * ate + 10.0 * rp)
    elif setting == 9:  # SETTING_7B — trailing block (sim.cpp:959-977)
        r = np.float32(base + 10.0 * rp - 5.0 * hf + 15.0 * he + 7.0 * ate)
    else:
        r = np.float32(base + 10.0 * ate + 10.0 * rp + 15.0 * he)
    return r


class Oracle:
    """Multi-world oracle with the same key tree as the vectorized env."""

    def __init__(self, seed_key, cfg: EnvConfig):
        world_salted = jax.random.fold_in(seed_key, SALT_WORLD)
        self.cfg = cfg
        self.worlds = [
            OracleWorld(cfg, jax.random.fold_in(world_salted, w))
            for w in range(cfg.num_worlds)
        ]

    def step(self, actions: np.ndarray):
        """actions: [W, A, 6]."""
        for w, world in enumerate(self.worlds):
            world.step(actions[w])

    def shift_observations(self):
        """cur -> prev for the 7 obs components + hidden (ShiftObservations
        graph, sim.cpp:1190-1220; matches env.shift_observations_impl)."""
        for w in self.worlds:
            w.prev_species = w.species.copy()
            w.prev_pos = w.pos.copy()
            w.prev_health = w.health.copy()
            w.prev_surrounding = w.surrounding.copy()
            w.prev_reward = w.reward.copy()
            w.prev_action = w.action.copy()
            w.prev_stats = w.stats.copy()
            if self.cfg.quirk_d4_shift_typo:
                # sim.cpp:1034: prev.hitEnemy <- cur.hitFriendly
                w.prev_stats[:, 1] = w.stats[:, 0]
            w.prev_hidden = w.hidden.copy()

    def field(self, name):
        return np.stack([getattr(w, name) for w in self.worlds])
