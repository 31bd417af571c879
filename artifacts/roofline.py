"""Roofline / MFU accounting for the two production kernels (VERDICT r2
missing item 3): what fraction of v5e peak does each hot kernel achieve.

Model
-----
v5e per-chip peaks (public spec / scaling-book numbers):
  MXU  197e12 bf16 FLOP/s
  VPU  8 sublanes x 128 lanes x 4 ALUs x ~0.94 GHz ~= 3.85e12 f32 lane-op/s
  HBM  819e9 B/s

Sensor kernel (ops/raycast_pallas.py::_kernel_packed) is VPU-bound: per
target visit each pair-tile executes ~15 elementwise ops on the [S, A] ray
fan plus ~30 on [1, A] rows (ocx/ocy/oc2/q, target broadcasts, finder
chain — counted from the kernel body; sqrt weighted as one op, so the
bound is optimistic).  Ideal time:

  visits/pair = ceil(max(n0, n1) / unroll) * unroll   (predicated lanes
                                                       still execute)
  lane_ops = pairs * visits * (15*S*A + 30*A) + pairs * 35*S*A  (epilogue)
  t_ideal = lane_ops / VPU_peak

Systems kernel (ops/step_pallas.py) is mixed compute/VMEM; its HBM floor
is the full state pytree in + out per step, reported as achieved bytes/s
vs the 819 GB/s peak (an upper bound on its bandwidth-boundedness, not a
claim the kernel saturates it).

Measurement follows CLAUDE.md discipline: K steps inside one lax.scan,
timed across two scan dispatches ending in a jax.device_get.

Usage: python artifacts/roofline.py  -> artifacts/ROOFLINE.json + stdout.
"""
import sys
sys.path.insert(0, "/root/repo")
import json
import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.ops import step_pallas
from madrona_bots_tpu.ops.raycast_pallas import raycast_pallas

VPU_PEAK = 8 * 128 * 4 * 0.94e9       # f32 lane-ops/s
MXU_PEAK = 197e12                     # bf16 FLOP/s
HBM_PEAK = 819e9                      # B/s
W, A, K = 8192, 128, 32
OPS_SA_VISIT = 15                     # [S, A] elementwise ops per visit
OPS_1A_VISIT = 30                     # [1, A] ops per visit (incl. finder)
OPS_SA_EPILOGUE = 35                  # wall pass + encode, per pair


def scan_time(block, st, reps=2):
    st, c = block(st, jax.random.key(2))
    jax.device_get(c)
    t0 = time.perf_counter()
    for i in range(reps):
        st, c = block(st, jax.random.fold_in(jax.random.key(3), i))
    jax.device_get(c)
    return (time.perf_counter() - t0) / reps / K


def state_bytes(state):
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(state))


def measure(init_agents, tag, report):
    cfg = EnvConfig(num_worlds=W, init_agents=init_agents, max_agents=A)
    S = cfg.sensor_size

    def rand_act(s, k):
        a = jax.random.randint(k, (W, A), 0, NUM_ACTIONS)
        return s.replace(action=jax.nn.one_hot(a, NUM_ACTIONS, dtype=jnp.int32))

    state = init_state(jax.random.key(0), cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def warmup(state, key):
        def f(s, k):
            return env_mod.sensor_pass(
                env_mod.step_systems(rand_act(s, k), cfg, True), cfg, True), ()
        state, _ = jax.lax.scan(f, state, jax.random.split(key, 64))
        return state, state.alive.sum()

    state, c = warmup(state, jax.random.key(9))
    alive = int(jax.device_get(c))

    # Steady-state population stats for the analytic visit count.
    n = jax.device_get(jnp.sum(state.alive.astype(jnp.int32), axis=1))
    import numpy as np
    nmax_pair = np.maximum(n[0::2], n[1::2])
    unroll = 4
    visits = np.ceil(nmax_pair / unroll) * unroll
    packed = nmax_pair <= A // 2
    # mode-0 pairs sweep all A slots per world (2 worlds, full lanes)
    visits_eff = np.where(packed, visits, 2 * A).sum()
    lane_ops = (visits_eff * (OPS_SA_VISIT * S * A + OPS_1A_VISIT * A)
                + (W // 2) * OPS_SA_EPILOGUE * S * A)
    t_ideal_sensor = lane_ops / VPU_PEAK

    @partial(jax.jit, donate_argnums=(0,))
    def sensor_block(st, key):
        def f(s, k):
            s = rand_act(s, k)
            d, sm, fi = raycast_pallas(s.pos, s.heading, s.alive, s.species,
                                       cfg)
            # thread outputs through the carry so the scan body cannot hoist
            s = s.replace(sensor_depth=d, sensor_semantic=sm, finder=fi)
            return s, ()
        st, _ = jax.lax.scan(f, st, jax.random.split(key, K))
        return st, (st.sensor_depth.astype(jnp.int32).sum()
                    + st.alive.sum())

    @partial(jax.jit, donate_argnums=(0,))
    def systems_block(st, key):
        def f(s, k):
            return step_pallas.fused_step_systems(rand_act(s, k), cfg), ()
        st, _ = jax.lax.scan(f, st, jax.random.split(key, K))
        return st, st.alive.sum()

    @partial(jax.jit, donate_argnums=(0,))
    def full_block(st, key):
        def f(s, k):
            return env_mod.step(rand_act(s, k), cfg, use_pallas=True), ()
        st, _ = jax.lax.scan(f, st, jax.random.split(key, K))
        return st, st.alive.sum()

    t_sensor = scan_time(sensor_block, jax.tree.map(jnp.copy, state))
    t_systems = scan_time(systems_block, jax.tree.map(jnp.copy, state))
    t_full = scan_time(full_block, jax.tree.map(jnp.copy, state))

    sb = state_bytes(state)
    report[tag] = {
        "worlds": W, "slots": A, "alive_total": alive,
        "pop_mean": float(n.mean()), "pop_max": int(n.max()),
        "packed_pair_fraction": float(packed.mean()),
        "sensor_ms": t_sensor * 1e3,
        "sensor_ideal_vpu_ms": t_ideal_sensor * 1e3,
        "sensor_vpu_fraction": t_ideal_sensor / t_sensor,
        "sensor_lane_ops": float(lane_ops),
        "systems_ms": t_systems * 1e3,
        "systems_hbm_bytes_per_step": 2 * sb,
        "systems_hbm_fraction": (2 * sb / t_systems) / HBM_PEAK,
        "full_step_ms": t_full * 1e3,
        "env_steps_per_s": W / t_full,
    }
    for k, v in report[tag].items():
        print(f"  {k:28s} {v}", flush=True)


def main():
    report = {"peaks": {"vpu_lane_ops_per_s": VPU_PEAK,
                        "mxu_bf16_flops": MXU_PEAK, "hbm_bytes_per_s": HBM_PEAK},
              "op_count_model": {"ops_SA_per_visit": OPS_SA_VISIT,
                                 "ops_1A_per_visit": OPS_1A_VISIT,
                                 "ops_SA_epilogue": OPS_SA_EPILOGUE}}
    print("typical population (init 32):", flush=True)
    measure(32, "typical_pop", report)
    print("saturated population (init 128):", flush=True)
    measure(128, "saturated_pop", report)
    with open("/root/repo/artifacts/ROOFLINE.json", "w") as f:
        json.dump(report, f, indent=1)
    print("wrote artifacts/ROOFLINE.json", flush=True)


if __name__ == "__main__":
    main()
