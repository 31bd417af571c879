"""Population distribution at bench steady state — sizes the sensor-kernel
world-packing win. Prints per-world alive-count stats and the efficiency of
several packing strategies after various warmup horizons.

Usage: python artifacts/popdist.py [worlds] [agents] [init_agents]
"""
import sys
sys.path.insert(0, "/root/repo")
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
from madrona_bots_tpu.env import env as env_mod
from madrona_bots_tpu.env.state import init_state


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    A = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    IA = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    cfg = EnvConfig(num_worlds=W, init_agents=IA, max_agents=A)

    @partial(jax.jit, donate_argnums=(0,))
    def run(state, key):
        def body(s, kk):
            a = jax.random.randint(kk, (W, A), 0, NUM_ACTIONS)
            s = s.replace(
                action=jax.nn.one_hot(a, NUM_ACTIONS, dtype=jnp.int32))
            return env_mod.sensor_pass(
                env_mod.step_systems(s, cfg, True), cfg, True), ()
        state, _ = jax.lax.scan(body, state, jax.random.split(key, 32))
        return state, state.alive.sum(axis=1)

    state = init_state(jax.random.key(0), cfg)
    total = 0
    for horizon in (32, 96, 128, 256, 512):
        while total < horizon:
            state, pops = run(
                state, jax.random.fold_in(jax.random.key(1), total))
            total += 32
        p = np.asarray(jax.device_get(pops))
        blk = p.reshape(-1, 8).max(axis=1)          # wb=8 block max
        srt = np.sort(p)
        blk_sorted = srt.reshape(-1, 8).max(axis=1)
        print(f"step {total:4d}: mean {p.mean():6.2f}  p50 {np.median(p):5.0f} "
              f"p95 {np.percentile(p, 95):5.0f}  max {p.max():3d}  "
              f"blockmax8 {blk.mean():6.2f}  sorted-blockmax8 "
              f"{blk_sorted.mean():6.2f}", flush=True)
        # packing: lanes = 128; how many worlds fit if each world gets
        # next_mult_of_8(pop)+pad lanes? group of g worlds needs
        # g * maxpop(group) <= 128.
        for g in (2, 4):
            grp = srt.reshape(-1, g).max(axis=1)
            ok = (g * grp <= 128).mean()
            print(f"   pack x{g} (sorted groups): feasible for {100*ok:5.1f}% "
                  f"of groups; visits/world if packed = "
                  f"{grp.mean():6.2f} vs per-world {p.mean():6.2f}")


if __name__ == "__main__":
    main()
