"""Sensor output-support measurement — can ANY candidate cull shrink the
target loop? (VERDICT r4 item 1 evidence.)

The production raycast kernel visits every alive target per world (one
lane-broadcast fold per target). A candidate-list scheme wins only if the
per-world candidate set is smaller than the population. Two sound lower
bounds on any correct candidate set, measured on real rollout states:

  * winners(w)    = distinct target slots that are the nearest hit for at
                    least one (source, ray) or finder ray in world w — the
                    SUPPORT of the sensor output. Any correct algorithm must
                    fold every winner into some running min, so
                    candidates >= winners.
  * hittable(w)   = targets that at least one source's fan can hit ignoring
                    occlusion — what a geometric (angle/near) cull keeps.
                    winners <= candidates <= hittable for occlusion-blind
                    culls.

If winners/pop ~ 1 at the bench operating points, no per-world candidate
list can beat the brute-force O(pop) visit loop: the output itself depends
on ~every alive agent. (Finer-than-world source grouping is the measured
r4 finder-split negative result: per-segment select chains cost more than
the visits they save.)

Why world-level lists are the only lever: the spec has NO range cap
(SPEC.md "Sensor pass": any hit sets semantic/finder; depth clamps but the
hit still registers), each fan covers half the plane, and tile lanes share
one visit list per world segment.

Usage: python artifacts/sensor_winners.py [worlds=1024] [steps=192]
Writes artifacts/SENSOR_WINNERS.json.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

from madrona_bots_tpu.config import NUM_ACTIONS, EnvConfig
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.raycast import _wall_distance, ray_angle_offsets
from madrona_bots_tpu.env.state import init_state

_INF = 3.0e38

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 192


_PALLAS = jax.default_backend() != "cpu"  # CPU smoke tests use the jnp path


@partial(jax.jit, static_argnames=("cfg",))
def roll(state, key, cfg):
    def body(s, k):
        a = jax.random.randint(k, (cfg.num_worlds, cfg.max_agents), 0,
                               NUM_ACTIONS)
        s = s.replace(action=jax.nn.one_hot(a, NUM_ACTIONS, dtype=jnp.int32))
        return env_mod.sensor_pass(
            env_mod.step_systems(s, cfg, _PALLAS), cfg, _PALLAS), ()
    return jax.lax.scan(body, state, jax.random.split(key, STEPS))[0]


@partial(jax.jit, static_argnames=("cfg",))
def analyze(pos, heading, alive, cfg):
    """Per-world (pop, winners, hittable) from one state.

    Same geometry as env/raycast.py but additionally carrying the argmin
    slot per (source, ray) and an any-valid-hit flag per target. FMA pins
    are irrelevant here (counts, not bytes)."""
    Wn, A = heading.shape
    S = cfg.sensor_size
    offsets = ray_angle_offsets(cfg)
    ang = heading[..., None] + offsets[None, None, :]
    dirs = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)   # [W, A, S, 2]
    fdir = jnp.stack([jnp.cos(heading), jnp.sin(heading)], axis=-1)
    r2 = jnp.float32(cfg.agent_radius ** 2)
    near = jnp.float32(cfg.near)
    self_idx = jnp.arange(A, dtype=jnp.int32)

    def body(b, carry):
        t_min, arg_min, f_min, f_arg, hittable, src_cnt = carry
        c = pos[:, b, :]
        oc = c[:, None, :] - pos                              # [W, A, 2]
        oc2 = oc[..., 0] ** 2 + oc[..., 1] ** 2
        ok = alive[:, b][:, None] & (self_idx != b)[None, :] & alive
        q = jnp.where(ok, r2 - oc2, -_INF)                    # [W, A]
        t_c = (dirs[..., 0] * oc[..., 0][:, :, None]
               + dirs[..., 1] * oc[..., 1][:, :, None])       # [W, A, S]
        disc = t_c * t_c + q[..., None]
        t_hit = t_c - jnp.sqrt(jnp.maximum(disc, 0.0))
        valid = (disc >= 0) & (t_hit > near)
        t_hit = jnp.where(valid, t_hit, _INF)
        closer = t_hit < t_min
        t_min = jnp.where(closer, t_hit, t_min)
        arg_min = jnp.where(closer, b, arg_min)
        ft_c = fdir[..., 0] * oc[..., 0] + fdir[..., 1] * oc[..., 1]
        fdisc = ft_c * ft_c + q
        ft = ft_c - jnp.sqrt(jnp.maximum(fdisc, 0.0))
        fvalid = (fdisc >= 0) & (ft > near)
        ft = jnp.where(fvalid, ft, _INF)
        fcloser = ft < f_min
        f_min = jnp.where(fcloser, ft, f_min)
        f_arg = jnp.where(fcloser, b, f_arg)
        hittable = hittable.at[:, b].set(valid.any(axis=(1, 2))
                                         | fvalid.any(axis=1))
        # Per-SOURCE hittable count: how many targets source a's own fan
        # can reach (ignoring occlusion) — the ceiling of a perfect
        # per-source cull (which TPU lanes cannot express anyway).
        src_cnt = src_cnt + (valid.any(axis=2) | fvalid).astype(jnp.int32)
        return t_min, arg_min, f_min, f_arg, hittable, src_cnt

    t0 = jnp.full((Wn, A, S), _INF, jnp.float32)
    a0 = jnp.full((Wn, A, S), -1, jnp.int32)
    ft0 = jnp.full((Wn, A), _INF, jnp.float32)
    fa0 = jnp.full((Wn, A), -1, jnp.int32)
    h0 = jnp.zeros((Wn, A), bool)
    sc0 = jnp.zeros((Wn, A), jnp.int32)
    t_ag, arg, f_t, f_arg, hittable, src_cnt = jax.lax.fori_loop(
        0, A, body, (t0, a0, ft0, fa0, h0, sc0))

    # A target wins a fan slot only if it also beats the wall (the sensor
    # output shows the wall otherwise); finder ignores walls.
    t_wall = _wall_distance(pos[:, :, None, :], dirs, cfg)
    t_wall = jnp.where(t_wall > near, t_wall, _INF)
    fan_win = (t_ag < t_wall) & alive[:, :, None]             # src alive
    fan_arg = jnp.where(fan_win, arg, -1)
    fdr_arg = jnp.where(alive & (f_t < _INF), f_arg, -1)

    tgt = jnp.arange(A)
    won = ((fan_arg[..., None] == tgt).any(axis=(1, 2))
           | (fdr_arg[..., None] == tgt).any(axis=1))         # [W, A]
    pop = alive.sum(axis=1)
    # Mean per-source hittable fraction over alive sources (vs pop - 1
    # other agents).
    src_frac = (jnp.where(alive, src_cnt, 0).sum(axis=1).astype(jnp.float32)
                / jnp.maximum(pop * jnp.maximum(pop - 1, 1), 1))
    return pop, won.sum(axis=1), hittable.sum(axis=1), src_frac


def stats(v):
    v = np.asarray(v, np.float64)
    return {"mean": round(float(v.mean()), 2),
            "p50": float(np.percentile(v, 50)),
            "p95": float(np.percentile(v, 95)),
            "max": float(v.max())}


def run_case(name, init_agents):
    cfg = EnvConfig(num_worlds=W, init_agents=init_agents, max_agents=128)
    state = init_state(jax.random.key(0), cfg)
    state = roll(state, jax.random.key(1), cfg)
    pop, won, hit, src_frac = jax.device_get(
        analyze(state.pos, state.heading, state.alive, cfg))
    pop = pop.astype(np.float64)
    out = {
        "pop": stats(pop),
        "winners": stats(won),
        "hittable": stats(hit),
        "winners_over_pop": stats(won / np.maximum(pop, 1)),
        "hittable_over_pop": stats(hit / np.maximum(pop, 1)),
        "per_source_hittable_frac": stats(src_frac),
    }
    print(name, json.dumps(out), flush=True)
    return out


def main():
    t0 = time.time()
    res = {"worlds": W, "steps": STEPS,
           "typical": run_case("typical(init=32)", 32),
           "saturated": run_case("saturated(init=128)", 128)}
    res["elapsed_s"] = round(time.time() - t0, 1)
    with open(os.path.join(os.path.dirname(__file__),
                           "SENSOR_WINNERS.json"), "w") as f:
        json.dump(res, f, indent=1)
    print("wrote artifacts/SENSOR_WINNERS.json")


if __name__ == "__main__":
    main()
