"""Fixed-seed parity: the vectorized jitted env vs the loop-based oracle.

The oracle (madrona_bots_tpu/oracle/oracle.py) is the executable SPEC; the
reference repo has no tests (SURVEY.md §4) so this is the trajectory anchor
demanded by BASELINE.md config[0]. Integer/discrete state must match exactly;
float32 state to tight tolerance (XLA fusion may differ ulps from the scalar
path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_bots_tpu import EnvConfig, init_state, step
from madrona_bots_tpu.env.env import set_actions
from madrona_bots_tpu.oracle.oracle import Oracle

INT_FIELDS = ["alive", "species", "health", "stats", "food_count", "food_cell",
              "species_counts", "finder", "sensor_depth", "sensor_semantic",
              "prev_sensor_depth", "prev_sensor_semantic", "action",
              "prev_species", "prev_health", "prev_action", "prev_stats"]
# Floats that are BIT-EXACT vs the oracle (positions/heading evolve through
# single IEEE ops; the oracle routes scalar trig through XLA to match ulps).
EXACT_FLOAT_FIELDS = ["pos", "heading", "prev_pos", "prev_hidden"]
# Residual reassociation deviations, enumerated in SPEC.md D10 with their
# measured ulp-level bounds: surrounding (fused-weight einsum vs the
# 4-corner FMA chain, <= 1e-6 abs) and the reward expressions (XLA fusion
# of the add/divide chain, <= 3e-7 abs).
TOL_FLOAT_FIELDS = {"surrounding": 1e-5, "reward": 1e-5,
                    "species_rewards": 1e-5, "prev_surrounding": 1e-5,
                    "prev_reward": 1e-5}
FLOAT_FIELDS = EXACT_FLOAT_FIELDS + list(TOL_FLOAT_FIELDS)


def random_actions(rng, W, A):
    acts = np.zeros((W, A, 6), np.int32)
    a = rng.integers(0, 6, (W, A))
    acts[np.arange(W)[:, None], np.arange(A)[None, :], a] = 1
    return acts


@pytest.mark.parametrize("seed", [0, 7])
def test_trajectory_parity(seed):
    cfg = EnvConfig(num_worlds=2, init_agents=32, max_agents=64)
    key = jax.random.key(seed)
    state = init_state(key, cfg)
    oracle = Oracle(key, cfg)

    from madrona_bots_tpu.env.env import shift_observations

    rng = np.random.default_rng(seed)
    for t in range(30):
        acts = random_actions(rng, cfg.num_worlds, cfg.max_agents)
        state = step(set_actions(state, jnp.array(acts)), cfg)
        oracle.step(acts)
        if t % 3 == 0:  # exercise the ShiftObservations graph parity too
            state = shift_observations(state, cfg)
            oracle.shift_observations()

        for f in INT_FIELDS:
            env_v = np.asarray(getattr(state, f))
            orc_v = oracle.field(f)
            mism = np.argwhere(env_v != orc_v)
            assert mism.size == 0, (
                f"step {t} field {f}: {mism.shape[0]} mismatches, first at "
                f"{mism[0]}: env={env_v[tuple(mism[0])]} oracle={orc_v[tuple(mism[0])]}")
        for f in EXACT_FLOAT_FIELDS:
            np.testing.assert_array_equal(
                np.asarray(getattr(state, f)), oracle.field(f),
                err_msg=f"step {t} field {f} (expected bit-exact)")
        for f, atol in TOL_FLOAT_FIELDS.items():
            np.testing.assert_allclose(
                np.asarray(getattr(state, f)), oracle.field(f),
                rtol=1e-6, atol=atol, err_msg=f"step {t} field {f}")


def test_env_determinism():
    """Same seed + same actions => identical trajectories (run twice)."""
    cfg = EnvConfig(num_worlds=2, init_agents=32, max_agents=64)
    rng = np.random.default_rng(3)
    acts = [random_actions(rng, cfg.num_worlds, cfg.max_agents) for _ in range(10)]

    def run():
        s = init_state(jax.random.key(5), cfg)
        for a in acts:
            s = step(set_actions(s, jnp.array(a)), cfg)
        return s

    s1, s2 = run(), run()
    for f in INT_FIELDS + FLOAT_FIELDS:
        np.testing.assert_array_equal(np.asarray(getattr(s1, f)),
                                      np.asarray(getattr(s2, f)), err_msg=f)


def test_jit_vs_eager():
    """The jitted step matches eager evaluation on discrete state."""
    from madrona_bots_tpu.env.env import step_systems, sensor_pass
    cfg = EnvConfig(num_worlds=2, init_agents=16, max_agents=32)
    s = init_state(jax.random.key(1), cfg)
    rng = np.random.default_rng(1)
    s_j = s
    s_e = jax.tree.map(jnp.copy, s)  # step() donates s_j's buffers
    for _ in range(5):
        acts = random_actions(rng, cfg.num_worlds, cfg.max_agents)
        # separate device buffers: step() donates its input state (which
        # includes the action array written by set_actions)
        s_j = step(set_actions(s_j, jnp.array(acts)), cfg)
        with jax.disable_jit():
            s_e = sensor_pass(step_systems(set_actions(s_e, jnp.array(acts)), cfg), cfg)
        for f in INT_FIELDS:
            np.testing.assert_array_equal(np.asarray(getattr(s_j, f)),
                                          np.asarray(getattr(s_e, f)), err_msg=f)


@pytest.mark.parametrize("pattern", ["breed", "shoot", "mixed"])
def test_trajectory_parity_directed(pattern):
    """Adversarial action patterns: maximize slot-allocator churn (everyone
    breeding) and damage/death churn (everyone shooting)."""
    cfg = EnvConfig(num_worlds=2, init_agents=32, max_agents=48)
    key = jax.random.key(11)
    state = init_state(key, cfg)
    oracle = Oracle(key, cfg)
    rng = np.random.default_rng(11)

    for t in range(25):
        acts = np.zeros((2, 48, 6), np.int32)
        if pattern == "breed":
            acts[:, :, 5] = 1
            acts[:, :, 0] = rng.integers(0, 2, (2, 48))  # some move too
        elif pattern == "shoot":
            acts[:, :, 4] = 1
            acts[:, :, 2] = rng.integers(0, 2, (2, 48))
        else:
            a = rng.integers(0, 6, (2, 48))
            acts[np.arange(2)[:, None], np.arange(48)[None, :], a] = 1
            acts[:, :, 4] |= rng.integers(0, 2, (2, 48)).astype(np.int32)
            acts[:, :, 5] |= rng.integers(0, 2, (2, 48)).astype(np.int32)
        state = step(set_actions(state, jnp.array(acts)), cfg)
        oracle.step(acts)
        for f in INT_FIELDS:
            env_v = np.asarray(getattr(state, f))
            orc_v = oracle.field(f)
            mism = np.argwhere(env_v != orc_v)
            assert mism.size == 0, (
                f"{pattern} step {t} field {f}: first mismatch {mism[0]}: "
                f"env={env_v[tuple(mism[0])]} oracle={orc_v[tuple(mism[0])]}")
        for f in EXACT_FLOAT_FIELDS:
            np.testing.assert_array_equal(
                np.asarray(getattr(state, f)), oracle.field(f),
                err_msg=f"{pattern} step {t} field {f} (expected bit-exact)")
        for f, atol in TOL_FLOAT_FIELDS.items():
            np.testing.assert_allclose(
                np.asarray(getattr(state, f)), oracle.field(f),
                rtol=1e-6, atol=atol, err_msg=f"{pattern} step {t} field {f}")


@pytest.mark.parametrize("setting", [2, 3, 4, 5, 6, 7, 8, 9])
def test_reward_settings_parity(setting):
    """All 9 reward settings (quirk Q6 made first-class; 9 = the trailing
    SETTING_7B block, sim.cpp:959-977) match the oracle."""
    from madrona_bots_tpu.config import RewardSetting
    cfg = EnvConfig(num_worlds=1, init_agents=16, max_agents=32,
                    reward_setting=RewardSetting(setting))
    key = jax.random.key(11)
    state = init_state(key, cfg)
    oracle = Oracle(key, cfg)
    rng = np.random.default_rng(11)
    for t in range(8):
        acts = random_actions(rng, 1, 32)
        state = step(set_actions(state, jnp.array(acts)), cfg)
        oracle.step(acts)
        np.testing.assert_allclose(
            np.asarray(state.reward), oracle.field("reward"),
            rtol=1e-5, atol=1e-4, err_msg=f"setting {setting} step {t}")


def test_odd_shapes_parity():
    """Non-default geometry/capacity still matches the oracle exactly."""
    cfg = EnvConfig(num_worlds=3, init_agents=8, max_agents=16,
                    num_chunks_x=5, num_chunks_y=3, total_allowed_food=11)
    key = jax.random.key(13)
    state = init_state(key, cfg)
    oracle = Oracle(key, cfg)
    rng = np.random.default_rng(13)
    for t in range(12):
        acts = random_actions(rng, 3, 16)
        state = step(set_actions(state, jnp.array(acts)), cfg)
        oracle.step(acts)
        for f in ["alive", "species", "health", "finder", "food_count"]:
            np.testing.assert_array_equal(
                np.asarray(getattr(state, f)), oracle.field(f),
                err_msg=f"step {t} field {f}")


def test_two_species_parity():
    """num_species != 4 works end to end (class quotas generalize)."""
    cfg = EnvConfig(num_worlds=2, init_agents=12, max_agents=24, num_species=2)
    key = jax.random.key(21)
    state = init_state(key, cfg)
    oracle = Oracle(key, cfg)
    rng = np.random.default_rng(21)
    for t in range(10):
        acts = random_actions(rng, 2, 24)
        state = step(set_actions(state, jnp.array(acts)), cfg)
        oracle.step(acts)
        for f in ["alive", "species", "health", "finder"]:
            np.testing.assert_array_equal(
                np.asarray(getattr(state, f)), oracle.field(f),
                err_msg=f"step {t} field {f}")


# Per-field byte digests: integer/discrete fields hash their exact bytes;
# float fields hash a fixed-point quantization (x * 2^12 rounded to i64) so
# the digest survives ulp-level backend drift but catches real drift
# (> ~2.4e-4). Compensating errors inside a sum cannot pass, unlike the old
# 6-aggregate-sums format.
GOLDEN_INT_FIELDS = ["alive", "species", "health", "stats", "food_count",
                     "food_cell", "species_counts", "finder", "sensor_depth",
                     "sensor_semantic", "action"]
GOLDEN_QUANT_FIELDS = ["pos", "heading", "reward", "surrounding"]


def _golden_digests(state):
    import hashlib
    row = {}
    for f in GOLDEN_INT_FIELDS:
        v = np.ascontiguousarray(np.asarray(getattr(state, f)))
        row[f] = hashlib.blake2b(v.tobytes(), digest_size=8).hexdigest()
    for f in GOLDEN_QUANT_FIELDS:
        v = np.asarray(getattr(state, f), dtype=np.float64)
        q = np.ascontiguousarray(np.round(v * 4096.0).astype(np.int64))
        row[f] = hashlib.blake2b(q.tobytes(), digest_size=8).hexdigest()
    return row


def _golden_trajectory_rows(n_steps=50):
    cfg = EnvConfig(num_worlds=2, init_agents=32, max_agents=64)
    state = init_state(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    rows = []
    for t in range(n_steps):
        acts = random_actions(rng, 2, 64)
        state = step(set_actions(state, jnp.array(acts)), cfg)
        rows.append({"t": t, **_golden_digests(state)})
    return rows


def test_golden_trajectory():
    """Frozen 50-step per-field digest trace (seed 0): detects accidental
    semantic drift that a co-changed env+oracle pair would hide. Regenerate
    (python tests/test_oracle_parity.py) ONLY for a deliberate, documented
    spec change (SPEC.md deviation process)."""
    import json, os
    golden = json.load(open(os.path.join(os.path.dirname(__file__),
                                         "golden_trajectory.json")))
    rows = _golden_trajectory_rows(len(golden))
    for row, want in zip(rows, golden):
        for k, v in want.items():
            assert row[k] == v, (want["t"], k, row[k], v)


if __name__ == "__main__":
    # Deliberate regeneration: python tests/test_oracle_parity.py
    import json, os
    out = os.path.join(os.path.dirname(__file__), "golden_trajectory.json")
    with open(out, "w") as f:
        json.dump(_golden_trajectory_rows(), f, indent=1)
    print(f"regenerated {out}")
