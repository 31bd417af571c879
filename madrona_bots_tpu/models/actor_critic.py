"""Config-driven actor-critic as pure JAX param pytrees.

Replaces learn/models.py's torch `ActorCritic` (models.py:91-184) with a
functional design: `init(key) -> params`, `apply(params, obs, memory)`.
The architecture (random per species) is data — a config dict — so the
checkpoint restore path can rebuild the net exactly (models.py:107-137,
ckpt.py:57), and all four species share ONE compiled train step (each
species' apply is inlined under the same jit).

Recurrent memory: the cell's hidden state is the `memory_dim`(=16)-vector
persisted inside the simulator (HiddenState component; training_loop.py:58-60,
137). For LSTM only `h` is carried (`c` starts at zero each tick — the
sequence length is 1 under TD(0), SURVEY.md §5 "long-context: absent").
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def _linear_init(key, fan_in, fan_out):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.float32(fan_in))
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


_ACT = {
    "Tanh": jnp.tanh,
    "ELU": jax.nn.elu,
    "LogSigmoid": jax.nn.log_sigmoid,
    "LeakyReLU": lambda x: jax.nn.leaky_relu(x, 0.01),
    "ReLU": jax.nn.relu,
}


def _init_mlp(key, layer_cfgs):
    params = []
    for i, lc in enumerate(layer_cfgs):
        if lc["type"] == "linear":
            params.append(_linear_init(jax.random.fold_in(key, i),
                                       lc["in_features"], lc["out_features"]))
        else:
            params.append(None)
    return params


def _apply_mlp(params, layer_cfgs, x):
    for p, lc in zip(params, layer_cfgs):
        if lc["type"] == "linear":
            x = x @ p["w"] + p["b"]
        else:
            x = _ACT[lc["activation"]](x)
    return x


def _init_recurrent(key, rc):
    """Gate layout follows torch (LSTM: i,f,g,o; GRU: r,z,n)."""
    din, dh = rc["input_dim"], rc["hidden_dim"]
    mult = {"LSTM": 4, "GRU": 3, "RNN": 1}[rc["type"]]
    k1, k2 = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.float32(dh))
    return {
        "wi": jax.random.uniform(k1, (din, mult * dh), jnp.float32, -bound, bound),
        "wh": jax.random.uniform(k2, (dh, mult * dh), jnp.float32, -bound, bound),
        "bi": jax.random.uniform(jax.random.fold_in(key, 2), (mult * dh,),
                                 jnp.float32, -bound, bound),
        "bh": jax.random.uniform(jax.random.fold_in(key, 3), (mult * dh,),
                                 jnp.float32, -bound, bound),
    }


def _apply_recurrent(params, rc, x, h):
    dh = rc["hidden_dim"]
    gi = x @ params["wi"] + params["bi"]
    gh = h @ params["wh"] + params["bh"]
    kind = rc["type"]
    if kind == "RNN":
        return jnp.tanh(gi + gh)
    if kind == "GRU":
        ir, iz, in_ = jnp.split(gi, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(in_ + r * hn)
        return (1.0 - z) * n + z * h
    # LSTM with c0 = 0 (sequence length 1; only h is persisted in the sim).
    ii, if_, ig, io = jnp.split(gi + gh, 4, axis=-1)
    i = jax.nn.sigmoid(ii)
    f = jax.nn.sigmoid(if_)
    g = jnp.tanh(ig)
    o = jax.nn.sigmoid(io)
    c = i * g  # + f * c0 with c0 = 0
    return o * jnp.tanh(c)


class ActorCritic:
    """Functional actor-critic bound to one architecture config.

    Mirrors the intended newer-models.py API (training_loop.py:59-60):
        logits, value, memory = model.forward(params, obs, prev_memory)
        new_memory = model.generate_memory(...)  # == memory
    """

    def __init__(self, config: Dict[str, Any]):
        self.config = config

    @classmethod
    def from_generator(cls, generator) -> "ActorCritic":
        return cls(generator.sample_config())

    def init(self, key: jax.Array):
        kf, kr, ka, kc = jax.random.split(key, 4)
        return {
            "feature": _init_mlp(kf, self.config["layers"]),
            "recurrent": _init_recurrent(kr, self.config["recurrent"]),
            "actor": _init_mlp(ka, self.config["actor"]),
            "critic": _init_mlp(kc, self.config["critic"]),
        }

    def forward(self, params, obs: jax.Array, memory: jax.Array):
        """obs [B, obs_dim] f32, memory [B, memory_dim] f32 ->
        (logits [B, act], value [B], new_memory [B, memory_dim])."""
        feat = _apply_mlp(params["feature"], self.config["layers"], obs)
        # Rematerialize the cell in the backward: its intermediates are
        # [B, memory_dim(=16)] / [B, 3*16] tensors whose minor dim pads to
        # the 128-lane tile when stored for grad — 8x/2.7x HBM inflation
        # per saved tensor at B~400k, for a recompute of two tiny matmuls.
        # (Full-forward remat is a separate, measured-per-algorithm knob:
        # MBOTS_A2C_REMAT / MBOTS_PPO_REMAT.)
        import os
        rc = self.config["recurrent"]
        if os.environ.get("MBOTS_REMAT_CELL", "1") == "1":
            cell = jax.checkpoint(
                lambda p, x, h: _apply_recurrent(p, rc, x, h))
            h = cell(params["recurrent"], feat, memory)
        else:
            h = _apply_recurrent(params["recurrent"], rc, feat, memory)
        logits = _apply_mlp(params["actor"], self.config["actor"], h)
        value = _apply_mlp(params["critic"], self.config["critic"], h)[..., 0]
        return logits, value, h

    def generate_memory(self, params, obs: jax.Array, memory: jax.Array):
        """The memory written back into the sim's HiddenState tensor
        (training_loop.py:60, 137)."""
        return self.forward(params, obs, memory)[2]

    def get_config(self) -> Dict[str, Any]:
        """Checkpoint round-trip (models.py:139-164)."""
        return self.config

    @property
    def memory_dim(self) -> int:
        return self.config["recurrent"]["hidden_dim"]

    @property
    def action_dim(self) -> int:
        return self.config["actor"][-1]["out_features"]

    @property
    def obs_dim(self) -> int:
        return self.config["layers"][0]["in_features"]


def compute_loss(action_log_probs, reward, prev_v, new_v, gamma: float = 1.0,
                 mask=None):
    """The reference TD(0) loss (models.py:180-184), masked for padded slots.

    advantage = r + gamma * V(s') - V(s), both values detached;
    actor loss = -sum(logp * adv); critic = SmoothL1(reward, V(s_prev))
    (the critic regresses V(s_prev) toward the raw reward — reference
    behavior, kept; note gamma enters only the advantage)."""
    if mask is None:
        mask = jnp.ones_like(reward)
    adv = reward + gamma * jax.lax.stop_gradient(new_v) - jax.lax.stop_gradient(prev_v)
    actor_loss = -jnp.sum(action_log_probs * adv * mask)
    # SmoothL1 (beta=1), mean over valid elements like torch's default 'mean'.
    diff = reward - prev_v
    huber = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff, jnp.abs(diff) - 0.5)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    critic_loss = jnp.sum(huber * mask) / denom
    return actor_loss, critic_loss
