"""Checkpoint manager — API/file-layout parity with learn/ckpt.py.

Per-species subdirectories holding `latest_model_epoch_N.ckpt.npz` plus
`best_{metric}_epoch_N.ckpt.npz` with delete-old-on-save semantics
(reference ckpt.py:13-37) and highest-epoch restore that rebuilds the random
architecture from the saved `model_config` (ckpt.py:39-61, models.py:107-137).

Storage: a single .npz per checkpoint — flattened param/opt leaves + the JSON
architecture config + epoch. On load the net and optimizer are re-initialized
from config and the leaves are poured back in (structure comes from code, data
from the file), matching the reference's config-rebuild path.
"""

from __future__ import annotations

import fnmatch
import glob
import json
import os
from typing import Any, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


class CheckpointManager:
    def __init__(self, base_ckpt_dir: str, restore: bool = True):
        self.base_ckpt_dir = base_ckpt_dir
        self.restore = restore
        os.makedirs(base_ckpt_dir, exist_ok=True)

    def save(self, model, params, opt_state, sub_dir: str, epoch: int,
             metric_name: str = "latest", verbose: bool = False):
        full_path = os.path.join(self.base_ckpt_dir, sub_dir)
        os.makedirs(full_path, exist_ok=True)
        if metric_name == "latest":
            filename = f"latest_model_epoch_{epoch}.ckpt.npz"
            stale_pattern = "latest_model_epoch_*.ckpt.npz"
        else:
            filename = f"best_{metric_name}_epoch_{epoch}.ckpt.npz"
            stale_pattern = f"best_{metric_name}_epoch_*.ckpt.npz"
        save_path = os.path.join(full_path, filename)

        p_leaves, _ = _flatten_with_paths(params)
        o_leaves, _ = _flatten_with_paths(opt_state)
        arrays = {f"p_{i}": np.asarray(x) for i, x in enumerate(p_leaves)}
        arrays.update({f"o_{i}": np.asarray(x) for i, x in enumerate(o_leaves)})
        arrays["model_config"] = np.frombuffer(
            json.dumps(model.get_config()).encode(), dtype=np.uint8)
        arrays["epoch"] = np.int64(epoch)
        # Write the new file FIRST, then delete stale ones (delete-first
        # would leave zero checkpoints if the save crashes mid-write).
        np.savez(save_path, **arrays)
        self._delete_old_files(full_path, stale_pattern, keep=filename)
        if verbose:
            print(f"Saved model to {save_path}")

    def load(self, model_class, optimizer, sub_dir: str,
             metric_name: str = "latest", verbose: bool = True
             ) -> Tuple[Any, Any, Any, int]:
        """Returns (model, params, opt_state, loaded_epoch)."""
        pattern = ("latest_model_epoch_*.ckpt.npz" if metric_name == "latest"
                   else f"best_{metric_name}_epoch_*.ckpt.npz")
        files = glob.glob(os.path.join(self.base_ckpt_dir, sub_dir, pattern))
        if not files:
            raise FileNotFoundError(f"No model found for metric:{metric_name}")
        files.sort(key=lambda x: int(x.split("_")[-1].split(".")[0]), reverse=True)
        load_path = files[0]
        loaded_epoch = int(load_path.split("_")[-1].split(".")[0])
        assert self.restore, "Restore must be True to load a model"
        if verbose:
            print(f"Loading model from {load_path}")

        data = np.load(load_path)
        config = json.loads(bytes(data["model_config"]).decode())
        model = model_class(config)
        # Rebuild structure from config, pour saved leaves back in.
        params0 = model.init(jax.random.key(0))
        opt0 = optimizer.init(params0)
        p_leaves, p_def = jax.tree.flatten(params0)
        o_leaves, o_def = jax.tree.flatten(opt0)
        params = jax.tree.unflatten(
            p_def, [jax.numpy.asarray(data[f"p_{i}"]) for i in range(len(p_leaves))])
        opt_state = jax.tree.unflatten(
            o_def, [jax.numpy.asarray(data[f"o_{i}"]) for i in range(len(o_leaves))])
        return model, params, opt_state, loaded_epoch

    def _delete_old_files(self, directory: str, pattern: str,
                          keep: str = ""):
        for f in os.listdir(directory):
            if f != keep and fnmatch.fnmatch(f, pattern):
                os.remove(os.path.join(directory, f))


def import_torch_checkpoint(path: str):
    """Load a REFERENCE .pt checkpoint (torch) into our functional model.

    The reference ships trained artifacts
    (checkpoints/universe_violence/species_*/​*.pt) written by its
    CheckpointManager.save (reference ckpt.py:28-33): a dict with
    'model_state_dict', 'optimizer_state_dict', 'model_config'. The config
    rebuilds the random architecture (reference models.py:107-137); the
    state_dict keys are positional within each nn.Sequential, so they align
    1:1 with the config's layer list (activations hold no params).

    Returns (model: ActorCritic, params) with weights transposed to our
    [in, out] convention. torch is imported lazily (CPU build is in the
    image; nothing else in the framework depends on it).
    """
    import torch  # local import: optional dependency, only for interop

    from madrona_bots_tpu.models.actor_critic import ActorCritic

    ck = torch.load(path, map_location="cpu", weights_only=False)
    config = ck["model_config"]
    sd = {k: v.detach().cpu().numpy() for k, v in ck["model_state_dict"].items()}
    model = ActorCritic(config)

    def mlp(prefix, layer_cfgs):
        out = []
        for i, lc in enumerate(layer_cfgs):
            if lc["type"] == "linear":
                out.append({
                    # torch Linear stores weight as [out, in]; ours is [in, out]
                    "w": np.ascontiguousarray(sd[f"{prefix}.{i}.weight"].T),
                    "b": sd[f"{prefix}.{i}.bias"],
                })
            else:
                out.append(None)
        return out

    params = {
        "feature": mlp("a2c_nets.feature", config["layers"]),
        "recurrent": {
            # torch RNN/GRU/LSTM store weight_ih/hh as [mult*dh, din/dh];
            # gate order matches ours (LSTM i,f,g,o; GRU r,z,n).
            "wi": np.ascontiguousarray(sd["a2c_nets.recurrent.weight_ih_l0"].T),
            "wh": np.ascontiguousarray(sd["a2c_nets.recurrent.weight_hh_l0"].T),
            "bi": sd["a2c_nets.recurrent.bias_ih_l0"],
            "bh": sd["a2c_nets.recurrent.bias_hh_l0"],
        },
        "actor": mlp("a2c_nets.actor", config["actor"]),
        "critic": mlp("a2c_nets.critic", config["critic"]),
    }
    params = jax.tree.map(jax.numpy.asarray, params)  # None = empty subtree
    return model, params


def save_sim_state(state, path: str):
    """Checkpoint the FULL simulator state (a capability the reference lacks:
    it only checkpoints models — SURVEY §5 'Sim state itself is NOT
    checkpointed'). The state is a pytree of arrays, so this is exact."""
    import jax
    leaves, _ = jax.tree.flatten(state)

    def raw(x):  # typed PRNG key arrays serialize via their uint32 data
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            return np.asarray(jax.random.key_data(x))
        return np.asarray(x)

    np.savez(path, **{f"s_{i}": raw(x) for i, x in enumerate(leaves)})


def load_sim_state(template, path: str):
    """Restore into the structure of `template` (an init_state of the same
    EnvConfig)."""
    import jax
    import jax.numpy as jnp
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)

    def back(i, tmpl):
        x = jnp.asarray(data[f"s_{i}"])
        if jax.dtypes.issubdtype(tmpl.dtype, jax.dtypes.prng_key):
            return jax.random.wrap_key_data(x)
        return x

    return jax.tree.unflatten(
        treedef, [back(i, t) for i, t in enumerate(leaves)])


def confirm_load(original_params, loaded_params) -> bool:
    """Parameter-equality check after restore (reference util.py:53-62)."""
    ok = True
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(original_params),
            jax.tree_util.tree_leaves_with_path(loaded_params)):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            print(f"Mismatch in parameter: {jax.tree_util.keystr(pa)}")
            ok = False
    if ok:
        print("All parameters match successfully!")
    return ok
