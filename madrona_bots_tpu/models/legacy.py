"""Legacy non-recurrent model family (reference: learn/model.py, the older
variant still used by learn/env.py).

`A2CNets(shared, actor, critic)` without a recurrent layer (model.py:6-17),
the same random-architecture generator minus the recurrent cell
(model.py:19-58), plus the gym-style episode helpers: discounted-return
rollout (`train_env_episode`, model.py:77-112) and the G-V advantage loss
(model.py:114-118).
"""

from __future__ import annotations

import random
from typing import Any, Dict

import jax
import jax.numpy as jnp

from madrona_bots_tpu.models.actor_critic import _apply_mlp, _init_mlp
from madrona_bots_tpu.models.generator import ACTIVATIONS

f32 = jnp.float32


class LegacySpeciesNetGenerator:
    """model.py:19-58: 1-3 random hidden layers, no recurrence."""

    def __init__(self, input_dim: int, output_dim: int, hidden_dim: int,
                 seed: int | None = None):
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.hidden_dim = hidden_dim
        self._rng = random.Random(seed)

    def sample_config(self) -> Dict[str, Any]:
        rng = self._rng
        layers = [{"type": "linear", "in_features": self.input_dim,
                   "out_features": self.hidden_dim}]
        for _ in range(rng.randint(1, 3)):
            layers.append({"type": "linear", "in_features": self.hidden_dim,
                           "out_features": self.hidden_dim})
            layers.append({"type": "activation",
                           "activation": rng.choice(ACTIVATIONS)})
        head = lambda out: [
            {"type": "linear", "in_features": self.hidden_dim,
             "out_features": self.hidden_dim},
            {"type": "activation", "activation": "ReLU"},
            {"type": "linear", "in_features": self.hidden_dim,
             "out_features": out},
        ]
        return {"shared": layers, "actor": head(self.output_dim),
                "critic": head(1)}


class LegacyActorCritic:
    """Non-recurrent functional actor-critic (model.py:60-75)."""

    def __init__(self, config: Dict[str, Any]):
        self.config = config

    @classmethod
    def from_generator(cls, gen: LegacySpeciesNetGenerator):
        return cls(gen.sample_config())

    def init(self, key: jax.Array):
        ks, ka, kc = jax.random.split(key, 3)
        return {"shared": _init_mlp(ks, self.config["shared"]),
                "actor": _init_mlp(ka, self.config["actor"]),
                "critic": _init_mlp(kc, self.config["critic"])}

    def forward(self, params, obs: jax.Array):
        h = _apply_mlp(params["shared"], self.config["shared"], obs)
        logits = _apply_mlp(params["actor"], self.config["actor"], h)
        value = _apply_mlp(params["critic"], self.config["critic"], h)[..., 0]
        return logits, value

    def get_config(self):
        return self.config


def discounted_returns(rewards: jax.Array, gamma: float = 0.99,
                       normalize: bool = True) -> jax.Array:
    """Episode returns G_t = sum_k gamma^k r_{t+k}, optionally normalized
    (model.py:92-105). rewards: [T, ...] along the episode axis."""

    def body(carry, r):
        g = r + gamma * carry
        return g, g

    _, g = jax.lax.scan(body, jnp.zeros_like(rewards[0]), rewards,
                        reverse=True)
    if normalize:
        mu = g.mean()
        sd = g.std() + 1e-8
        g = (g - mu) / sd
    return g


def legacy_loss(action_log_probs, returns, values):
    """adv = G - V; actor -sum(logp*adv); critic SmoothL1(G, V)
    (model.py:114-118)."""
    adv = returns - jax.lax.stop_gradient(values)
    actor = -jnp.sum(action_log_probs * adv)
    diff = returns - values
    huber = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff,
                      jnp.abs(diff) - 0.5)
    return actor, huber.mean()
