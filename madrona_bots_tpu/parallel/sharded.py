"""Sharded train tick: same fused tick, jitted with mesh shardings.

The per-species update sums losses over the worlds-sharded batch while params
are replicated, so XLA GSPMD emits exactly the `psum` over ICI the design
calls for (BASELINE config[3]) — no hand-written collectives in the learner.
"""

from __future__ import annotations

from typing import Sequence

import jax
from jax.sharding import Mesh

from madrona_bots_tpu.config import EnvConfig
from madrona_bots_tpu.learn import a2c
from madrona_bots_tpu.models.actor_critic import ActorCritic
from madrona_bots_tpu.parallel.mesh import state_sharding, replicated


def make_sharded_train_tick(models: Sequence[ActorCritic], cfg: EnvConfig,
                            mesh: Mesh, lr: float = 3e-4, gamma: float = 1.0,
                            proper_log_probs: bool = False,
                            use_pallas: bool = False, compute_dtype=None,
                            quirk_compat: bool = False,
                            learner_slots_per_class=None,
                            stacked: bool = False):
    """Like a2c.make_train_tick but with explicit in/out shardings over the
    mesh: state worlds-sharded, train states + key replicated. Accepts the
    full single-chip feature set (learner-row compaction, quirk_compat,
    species-stacked batched update) — the compaction one-hot contractions
    are per-world, so they shard over the worlds axis with zero cross-chip
    traffic; the stacked update's species axis is replicated like the
    per-species loop's params."""
    base_tick, optimizer = a2c.make_train_tick(
        models, cfg, lr=lr, gamma=gamma, proper_log_probs=proper_log_probs,
        use_pallas=use_pallas, compute_dtype=compute_dtype,
        quirk_compat=quirk_compat,
        learner_slots_per_class=learner_slots_per_class, stacked=stacked)
    # Re-jit the underlying function with shardings (base_tick is jitted
    # without them; reuse its wrapped impl).
    impl = base_tick.__wrapped__

    st_shard = state_sharding(mesh)
    repl = replicated(mesh)
    tick = jax.jit(
        impl,
        in_shardings=(st_shard, None, repl),  # None: train states keep their
        out_shardings=(st_shard, None, None),  # (replicated) placement
        donate_argnums=(0, 1),
    )
    return tick, optimizer
