"""Round-4 sensor bisect: full ladder vs raw_out (no epilogue) vs forced
modes, at typical AND saturated population. Drives the raycast redesign
(VERDICT r3 item 1). Usage: python artifacts/raybisect4.py [typical|sat|both]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

from madrona_bots_tpu.config import NUM_ACTIONS, EnvConfig
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.state import init_state
from madrona_bots_tpu.ops import raycast_pallas as rp

K = 32
W0, A = 8192, 128


def get_state(cfg):
    state = init_state(jax.random.key(0), cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def warm(state, key):
        def f(s, k):
            a = jax.random.randint(k, (W0, A), 0, NUM_ACTIONS)
            s = s.replace(
                action=jax.nn.one_hot(a, NUM_ACTIONS, dtype=jnp.int32))
            return env_mod.sensor_pass(
                env_mod.step_systems(s, cfg, True), cfg, True), ()
        state, _ = jax.lax.scan(f, state, jax.random.split(key, 64))
        return state, state.alive.sum()

    state, c = warm(state, jax.random.key(9))
    print("pop mean", float(jax.device_get(c)) / W0, flush=True)
    return state


def run(label, fn, args):
    @jax.jit
    def block(key, pos, heading, alive, species):
        def f(carry, k):
            pos_b = pos + carry * jnp.float32(1e-30)
            outs = fn(pos_b, heading, alive, species)
            acc = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            return carry + acc * jnp.float32(1e-20), ()
        acc, _ = jax.lax.scan(f, jnp.float32(0), jax.random.split(key, K))
        return acc

    acc = block(jax.random.key(1), *args)
    jax.device_get(acc)
    t0 = time.perf_counter()
    for i in range(2):
        acc = block(jax.random.fold_in(jax.random.key(2), i), *args)
    jax.device_get(acc)
    dt = (time.perf_counter() - t0) / 2 / K
    print(f"{label}: {dt*1e3:8.3f} ms", flush=True)
    return dt


def profile(cfg, tag):
    state = get_state(cfg)
    args = (state.pos, state.heading, state.alive, state.species)
    run(f"[{tag}] production raycast_pallas   ",
        lambda *a: rp.raycast_pallas(*a, cfg), args)
    run(f"[{tag}] ladder full                 ",
        lambda *a: rp.raycast_pallas_ladder(*a, cfg), args)
    run(f"[{tag}] ladder raw_out (no epilogue)",
        lambda *a: rp.raycast_pallas_ladder(*a, cfg, raw_out=True), args)
    run(f"[{tag}] ladder force pair (m12=0)   ",
        lambda *a: rp.raycast_pallas_ladder(*a, cfg, force_m12=0,
                                            raw_out=True), args)
    if tag == "typical":
        run(f"[{tag}] ladder force tri (m12=1)    ",
            lambda *a: rp.raycast_pallas_ladder(*a, cfg, force_m12=1,
                                                raw_out=True), args)
    run(f"[{tag}] ladder nosort               ",
        lambda *a: rp.raycast_pallas_ladder(*a, cfg, sort_worlds=False),
        args)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("typical", "both"):
        profile(EnvConfig(num_worlds=W0, init_agents=32, max_agents=A),
                "typical")
    if which in ("sat", "both"):
        profile(EnvConfig(num_worlds=W0, init_agents=128, max_agents=A),
                "sat")
