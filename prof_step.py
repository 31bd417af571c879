import os, time, functools
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from madrona_bots_tpu.config import EnvConfig, NUM_ACTIONS
from madrona_bots_tpu.env import systems, env as env_mod
from madrona_bots_tpu.env.state import init_state

W, A = 8192, 128
cfg = EnvConfig(num_worlds=W, init_agents=32, max_agents=A)
state = env_mod.step(init_state(jax.random.key(0), cfg), cfg, True)
state = jax.block_until_ready(state)

key = jax.random.key(9)
acts = jax.nn.one_hot(
    jax.random.randint(key, (W, A), 0, NUM_ACTIONS), NUM_ACTIONS,
    dtype=jnp.int32)
state = state.replace(action=acts)

def red(out):
    return sum(jnp.sum(jnp.asarray(x).astype(jnp.float32))
               for x in jax.tree.leaves(out)
               if not jax.dtypes.issubdtype(x.dtype, jax.dtypes.extended))

def bench(name, f, *args, iters=3):
    g = jax.jit(lambda *a: red(f(*a)))
    c = g(*args); jax.device_get(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.device_get(g(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:24s} {dt*1e3:10.3f} ms", flush=True)

bench("food_spawn", lambda fc, fcell, nf, wk, t: systems.food_spawn(
    fc, fcell, nf, wk, t, cfg), state.food_count, state.food_cell,
    state.num_food, state.world_keys, state.step_count)

bench("action_system", lambda p, h, al, sp, ac, fi: systems.action_system(
    p, h, al, sp, ac, fi, cfg), state.pos, state.heading, state.alive,
    state.species, state.action, state.finder)

act_out = jax.jit(lambda p, h, al, sp, ac, fi: systems.action_system(
    p, h, al, sp, ac, fi, cfg))(state.pos, state.heading, state.alive,
                                state.species, state.action, state.finder)
act_out = jax.tree.map(jax.block_until_ready, act_out)

bench("health_sync", lambda *a: systems.health_sync(*a, cfg),
      act_out.pos, act_out.heading, state.alive, state.species, state.health,
      state.action, state.finder, act_out.damage, state.food_count,
      state.food_cell, state.num_food)

h_out = jax.jit(lambda *a: systems.health_sync(*a, cfg))(
    act_out.pos, act_out.heading, state.alive, state.species, state.health,
    state.action, state.finder, act_out.damage, state.food_count,
    state.food_cell, state.num_food)
h_out = jax.tree.map(jax.block_until_ready, h_out)

bench("surrounding", lambda *a: systems.surrounding_observation(*a, cfg),
      h_out.pos, h_out.alive, act_out.chunk_agents, act_out.chunk_speed)

bench("species_info", lambda *a: systems.species_info(*a[:-1], a[-1], cfg),
      h_out.pos, h_out.heading, h_out.alive, h_out.species, h_out.health,
      (~state.alive) & (~h_out.born), state.world_keys, state.step_count)

bench("claim_slots", systems.claim_slots, ~state.alive, h_out.reproduced)

bench("step_systems", lambda s: env_mod.step_systems(s, cfg), state)
