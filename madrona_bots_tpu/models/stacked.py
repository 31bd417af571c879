"""Species-stacked actor-critic: all NS per-species nets in one batched net.

The per-species architectures (models/generator.py; reference
learn/models.py:14-89) differ only in trunk DEPTH (1-3 hidden layers),
per-layer ACTIVATION, and recurrent CELL TYPE — every matmul shape is
shared (obs_dim -> hidden_dim -> ... -> memory_dim -> heads). The training
paths (learn/a2c.py, learn/ppo.py) therefore pay NS sequential copies of
every XLA op per tick/minibatch purely for weight heterogeneity, and on TPU
each op carries a fixed issue cost that dominates at these tiny net sizes.

This module stacks the NS param trees into ONE pytree with a leading [NS]
axis and runs every matmul as a single batched `dot_general`:

  * trunks are padded to the max depth; a species shorter than the pad
    passes its activation input through unchanged (the padded layer's
    weights are zeros, receive zero gradient, and never move under Adam);
  * per-layer activations apply per species SLICE (so each species pays
    exactly its own elementwise cost; XLA fuses the slice/concat into the
    surrounding matmuls);
  * recurrent cells: wi/wh/bi/bh are padded to the LSTM gate width (4*H);
    GRU reads the first 3*H columns, RNN the first H — each species' cell
    formula runs on its slice;
  * actor/critic heads are shape- and activation-identical across species
    (generator.py:53-66) and batch with no slicing at all.

Per-species forward values are IDENTICAL to ActorCritic.forward: each
output element is the same dot product in the same order (a batched
dot_general computes each batch element exactly as the unbatched dot), and
activations/cells run the same ops on the same values. Verified exactly in
tests/test_stacked.py.

`stack_params`/`unstack_params` convert between the per-species param lists
(checkpoint format, learn/ckpt.py) and the stacked tree, so stacking is a
pure execution-layout choice — no behavioral or persistence change.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import optax

from madrona_bots_tpu.models.actor_critic import _ACT, ActorCritic

f32 = jnp.float32


def per_species_clip_by_global_norm(max_norm: float, num_species: int
                                    ) -> optax.GradientTransformation:
    """optax.clip_by_global_norm, applied independently per species slice.

    For a species-STACKED tree (every leaf carries a leading [NS] axis) the
    plain transform would clip by the JOINT norm across species — different
    updates than the per-species training loop it replaces. Here each
    species' norm sums only its own slices (padded entries are zeros and
    contribute exactly 0.0), and the clip formula matches optax's
    `(t / g_norm) * max_norm` form so per-species values agree with the
    unstacked optimizer up to float-summation order of the norm."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        sq = sum(jnp.sum(jnp.square(x.reshape(num_species, -1)), axis=1)
                 for x in jax.tree.leaves(updates))
        g_norm = jnp.sqrt(sq)                                # [NS]
        trigger = g_norm < max_norm

        def clip_fn(t):
            shape = (num_species,) + (1,) * (t.ndim - 1)
            scaled = (t / g_norm.astype(t.dtype).reshape(shape)) * max_norm
            return jnp.where(trigger.reshape(shape), t, scaled)

        return jax.tree.map(clip_fn, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def _unflatten_like(template, vec):
    """Inverse of optax.flatten's ravel_pytree order: split `vec` into the
    leaves of `template` (jax.tree leaf order, per-leaf ravel)."""
    leaves, tdef = jax.tree.flatten(template)
    out, i = [], 0
    for leaf in leaves:
        n = leaf.size
        out.append(vec[i:i + n].reshape(leaf.shape).astype(leaf.dtype))
        i += n
    assert i == vec.size, "flat vector size does not match the template"
    return jax.tree.unflatten(tdef, out)


def _flatten_like(tree):
    return jnp.concatenate([x.ravel() for x in jax.tree.leaves(tree)])


def _trunk_shape(config) -> tuple | None:
    """(D, hd, depth, (act names...)) if the trunk fits the generator's
    canonical pattern (generator.py:39-45), else None."""
    layers = config["layers"]
    if not layers or layers[0]["type"] != "linear":
        return None
    D = layers[0]["in_features"]
    hd = layers[0]["out_features"]
    rest = layers[1:]
    if len(rest) % 2:
        return None
    acts = []
    for i in range(0, len(rest), 2):
        lin, act = rest[i], rest[i + 1]
        if (lin["type"] != "linear" or lin["in_features"] != hd
                or lin["out_features"] != hd
                or act["type"] != "activation"):
            return None
        acts.append(act["activation"])
    return D, hd, len(acts), tuple(acts)


def _head_shape(head, din, hd, dout) -> bool:
    return (len(head) == 3
            and head[0] == {"type": "linear", "in_features": din,
                            "out_features": hd}
            and head[1] == {"type": "activation", "activation": "ReLU"}
            and head[2] == {"type": "linear", "in_features": hd,
                            "out_features": dout})


def stackable(configs: Sequence[Dict[str, Any]]) -> bool:
    """True iff every config fits the generator's architecture space with
    shared (obs_dim, hidden_dim, memory_dim, action_dim)."""
    shapes = [_trunk_shape(c) for c in configs]
    if any(s is None for s in shapes):
        return False
    D, hd = shapes[0][0], shapes[0][1]
    if any((s[0], s[1]) != (D, hd) for s in shapes):
        return False
    for c in configs:
        rc = c["recurrent"]
        if (rc["type"] not in ("LSTM", "GRU", "RNN")
                or rc["input_dim"] != hd
                or rc["hidden_dim"] != configs[0]["recurrent"]["hidden_dim"]):
            return False
        H = rc["hidden_dim"]
        aout = c["actor"][-1]["out_features"]
        if aout != configs[0]["actor"][-1]["out_features"]:
            return False
        if not (_head_shape(c["actor"], H, hd, aout)
                and _head_shape(c["critic"], H, hd, 1)):
            return False
    return True


_CELL_MULT = {"LSTM": 4, "GRU": 3, "RNN": 1}


class StackedActorCritic:
    """Batched execution of NS heterogeneous ActorCritic nets.

    Construct with the per-species models; `stack_params` the per-species
    param trees once, then `forward(stacked, obs [NS, B, D], mem [NS, B, H])`
    replaces NS sequential `ActorCritic.forward` calls."""

    def __init__(self, models: Sequence[ActorCritic]):
        configs = [m.config for m in models]
        assert stackable(configs), "architectures outside the stackable space"
        self.models = list(models)
        self.configs = configs
        D, hd, _, _ = _trunk_shape(configs[0])
        self.obs_dim = D
        self.hidden_dim = hd
        self.memory_dim = configs[0]["recurrent"]["hidden_dim"]
        self.action_dim = configs[0]["actor"][-1]["out_features"]
        shapes = [_trunk_shape(c) for c in configs]
        self.depths = [s[2] for s in shapes]
        self.acts = [s[3] for s in shapes]
        self.max_depth = max(self.depths)
        self.cells = [c["recurrent"]["type"] for c in configs]

    @property
    def num_species(self) -> int:
        return len(self.configs)

    # -- param layout conversion ------------------------------------------

    def stack_params(self, params_list: Sequence[Dict[str, Any]]):
        """Per-species trees (ActorCritic.init layout) -> stacked tree."""
        NS, hd, H = self.num_species, self.hidden_dim, self.memory_dim
        g4 = 4 * H

        def spad(rows):  # stack, zero-padding missing/short entries
            return jnp.stack(rows, axis=0)

        l0w, l0b = [], []
        hidw = [[] for _ in range(self.max_depth)]
        hidb = [[] for _ in range(self.max_depth)]
        rec = {k: [] for k in ("wi", "wh", "bi", "bh")}
        heads = {h: {k: [] for k in ("w1", "b1", "w2", "b2")}
                 for h in ("actor", "critic")}
        for s, p in enumerate(params_list):
            lins = [q for q in p["feature"] if q is not None]
            l0w.append(lins[0]["w"])
            l0b.append(lins[0]["b"])
            for j in range(self.max_depth):
                if j < self.depths[s]:
                    hidw[j].append(lins[1 + j]["w"])
                    hidb[j].append(lins[1 + j]["b"])
                else:
                    hidw[j].append(jnp.zeros((hd, hd), f32))
                    hidb[j].append(jnp.zeros((hd,), f32))
            m = _CELL_MULT[self.cells[s]] * H
            r = p["recurrent"]
            rec["wi"].append(jnp.zeros((hd, g4), f32).at[:, :m].set(r["wi"]))
            rec["wh"].append(jnp.zeros((H, g4), f32).at[:, :m].set(r["wh"]))
            rec["bi"].append(jnp.zeros((g4,), f32).at[:m].set(r["bi"]))
            rec["bh"].append(jnp.zeros((g4,), f32).at[:m].set(r["bh"]))
            for h in ("actor", "critic"):
                lh = [q for q in p[h] if q is not None]
                heads[h]["w1"].append(lh[0]["w"])
                heads[h]["b1"].append(lh[0]["b"])
                heads[h]["w2"].append(lh[1]["w"])
                heads[h]["b2"].append(lh[1]["b"])
        out = {
            "l0": {"w": spad(l0w), "b": spad(l0b)},
            "rec": {k: spad(v) for k, v in rec.items()},
            "actor": {k: spad(v) for k, v in heads["actor"].items()},
            "critic": {k: spad(v) for k, v in heads["critic"].items()},
        }
        if self.max_depth:
            out["hid"] = {
                "w": jnp.stack([spad(r) for r in hidw], axis=1),  # [NS,L,hd,hd]
                "b": jnp.stack([spad(r) for r in hidb], axis=1),  # [NS,L,hd]
            }
        return out

    def unstack_params(self, stacked) -> List[Dict[str, Any]]:
        """Stacked tree -> per-species trees (ActorCritic.init layout)."""
        H = self.memory_dim
        out = []
        for s in range(self.num_species):
            feature = [{"w": stacked["l0"]["w"][s],
                        "b": stacked["l0"]["b"][s]}]
            for j in range(self.depths[s]):
                feature.append({"w": stacked["hid"]["w"][s, j],
                                "b": stacked["hid"]["b"][s, j]})
                feature.append(None)
            m = _CELL_MULT[self.cells[s]] * H
            rec = {"wi": stacked["rec"]["wi"][s][:, :m],
                   "wh": stacked["rec"]["wh"][s][:, :m],
                   "bi": stacked["rec"]["bi"][s][:m],
                   "bh": stacked["rec"]["bh"][s][:m]}
            heads = {}
            for h in ("actor", "critic"):
                hp = stacked[h]
                heads[h] = [{"w": hp["w1"][s], "b": hp["b1"][s]}, None,
                            {"w": hp["w2"][s], "b": hp["b2"][s]}]
            out.append({"feature": feature, "recurrent": rec,
                        "actor": heads["actor"], "critic": heads["critic"]})
        return out

    # -- optimizer-state layout conversion ----------------------------------
    #
    # Production optimizers wrap Adam in optax.flatten (learn/a2c.py
    # make_optimizer, learn/ppo.py make_ppo_optimizer), so their states hold
    # the Adam moments as ONE flat vector in params-leaf order. Moments are
    # param-shaped, so the same stack_params/unstack_params machinery
    # converts them — these helpers just route each flat moment vector
    # through unflatten -> (un)stack -> reflatten so a universe checkpoint
    # written by the per-species loop resumes EXACTLY (same Adam moments)
    # under the stacked tick, and vice versa. Padded entries carry zero
    # moments, matching their permanently-zero gradients.

    def _convert_flat(self, vecs_or_vec, params_list, stacked_params,
                      to_stacked: bool):
        if to_stacked:
            trees = [_unflatten_like(params_list[s], vecs_or_vec[s])
                     for s in range(self.num_species)]
            return _flatten_like(self.stack_params(trees))
        trees = self.unstack_params(
            _unflatten_like(stacked_params, vecs_or_vec))
        return [_flatten_like(t) for t in trees]

    def stack_opt_state(self, opt_states: Sequence[Any], params_list,
                        stacked_params):
        """Per-species flattened-optimizer states -> one stacked state.

        Every leaf that is a flat params-sized vector (Adam mu/nu under
        optax.flatten) converts through the stacked layout; scalar leaves
        (step counts) must agree across species and pass through."""
        sizes = [sum(x.size for x in jax.tree.leaves(p)) for p in params_list]

        def conv(*xs):
            if xs[0].ndim == 1 and all(x.size == n
                                       for x, n in zip(xs, sizes)):
                return self._convert_flat(list(xs), params_list,
                                          stacked_params, to_stacked=True)
            return xs[0]

        return jax.tree.map(conv, *opt_states)

    def unstack_opt_state(self, opt_state, params_list, stacked_params
                          ) -> List[Any]:
        """One stacked flattened-optimizer state -> per-species states."""
        n_st = sum(x.size for x in jax.tree.leaves(stacked_params))
        leaves, tdef = jax.tree.flatten(opt_state)
        per = [[] for _ in range(self.num_species)]
        for leaf in leaves:
            if leaf.ndim == 1 and leaf.size == n_st:
                vs = self._convert_flat(leaf, params_list, stacked_params,
                                        to_stacked=False)
            else:
                vs = [leaf] * self.num_species
            for s in range(self.num_species):
                per[s].append(vs[s])
        return [jax.tree.unflatten(tdef, p) for p in per]

    # -- forward ------------------------------------------------------------

    def _cell(self, params, x, h):
        """Batched gate matmuls + per-species cell formula on slices.

        Same values as _apply_recurrent: the padded gate columns are sliced
        away before any nonlinearity, and each species' formula matches its
        cell type (torch gate order; LSTM c0 = 0)."""
        H = self.memory_dim
        gi = (jnp.einsum("sbi,sio->sbo", x, params["wi"])
              + params["bi"][:, None, :])
        gh = (jnp.einsum("sbi,sio->sbo", h, params["wh"])
              + params["bh"][:, None, :])
        outs = []
        for s, kind in enumerate(self.cells):
            gis, ghs, hs = gi[s], gh[s], h[s]
            if kind == "RNN":
                outs.append(jnp.tanh(gis[:, :H] + ghs[:, :H]))
            elif kind == "GRU":
                ir, iz, in_ = (gis[:, :H], gis[:, H:2 * H], gis[:, 2 * H:3 * H])
                hr, hz, hn = (ghs[:, :H], ghs[:, H:2 * H], ghs[:, 2 * H:3 * H])
                r = jax.nn.sigmoid(ir + hr)
                z = jax.nn.sigmoid(iz + hz)
                n = jnp.tanh(in_ + r * hn)
                outs.append((1.0 - z) * n + z * hs)
            else:  # LSTM, c0 = 0
                g = gis + ghs
                i = jax.nn.sigmoid(g[:, :H])
                gg = jnp.tanh(g[:, 2 * H:3 * H])
                o = jax.nn.sigmoid(g[:, 3 * H:])
                outs.append(o * jnp.tanh(i * gg))
        return jnp.stack(outs, axis=0)

    def forward(self, params, obs: jax.Array, memory: jax.Array):
        """obs [NS, B, obs_dim], memory [NS, B, memory_dim] ->
        (logits [NS, B, act], value [NS, B], new_memory [NS, B, memory_dim]).

        Per-species slices equal ActorCritic.forward on the same params."""
        x = (jnp.einsum("sbi,sio->sbo", obs, params["l0"]["w"])
             + params["l0"]["b"][:, None, :])
        for j in range(self.max_depth):
            z = (jnp.einsum("sbi,sio->sbo", x, params["hid"]["w"][:, j])
                 + params["hid"]["b"][:, j, None, :])
            # Per-species activation on slices; species shorter than j+1
            # layers pass x through (their padded weights are zero and
            # receive zero gradient — Adam never moves them).
            x = jnp.stack(
                [_ACT[self.acts[s][j]](z[s]) if j < self.depths[s] else x[s]
                 for s in range(self.num_species)], axis=0)

        import os
        if os.environ.get("MBOTS_REMAT_CELL", "1") == "1":
            h = jax.checkpoint(self._cell)(params["rec"], x, memory)
        else:
            h = self._cell(params["rec"], x, memory)

        def head(hp, y):
            y1 = jax.nn.relu(
                jnp.einsum("sbi,sio->sbo", y, hp["w1"])
                + hp["b1"][:, None, :])
            return (jnp.einsum("sbi,sio->sbo", y1, hp["w2"])
                    + hp["b2"][:, None, :])

        logits = head(params["actor"], h)
        value = head(params["critic"], h)[..., 0]
        return logits, value, h
