"""ctypes bindings for the native host data plane (native/mbots_host.cpp).

The reference's host layer is C++ (src/entry/mgr.cpp); ours keeps the
equivalent host-side machinery native too: the species-major export
permutation (replacing the device radix sort, sim.cpp:1148-1149), the
per-world offset table (replacing the SimBridge readback, mgr.cpp:57-62),
and the export gather / write-back scatter. Falls back to numpy when the
shared library hasn't been built (`native/build.sh`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "libmbots_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        build = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
        if os.path.exists(build):
            try:
                subprocess.run(["sh", build], check=True, capture_output=True)
            except Exception:
                return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.mbots_compaction.restype = ctypes.c_int32
    lib.mbots_compaction.argtypes = [i8p, i32p, ctypes.c_int32,
                                     ctypes.c_int32, ctypes.c_int32,
                                     i32p, i32p]
    lib.mbots_world_offsets.restype = None
    lib.mbots_world_offsets.argtypes = [i8p, ctypes.c_int32, ctypes.c_int32,
                                        i32p, i32p]
    lib.mbots_inverse_perm.restype = None
    lib.mbots_inverse_perm.argtypes = [i32p, ctypes.c_int32, ctypes.c_int32,
                                       i32p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def compaction(alive: np.ndarray, species: np.ndarray, num_species: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Species-major export permutation.

    alive [W, A] bool, species [W, A] int32 ->
    (perm [n_alive] int32 flat indices, species_starts [num_species+1] int32).
    """
    W, A = alive.shape
    lib = _load()
    if lib is None:  # numpy fallback (same deterministic order)
        flat_alive = alive.reshape(-1)
        flat_sp = species.reshape(-1).astype(np.int64)
        flat = np.arange(flat_alive.size)
        key = np.where(flat_alive, flat_sp * flat_alive.size + flat,
                       np.iinfo(np.int64).max)
        order = np.argsort(key, kind="stable")[: int(flat_alive.sum())]
        sp_sorted = flat_sp[order]
        counts = np.bincount(sp_sorted, minlength=num_species + 1)[1:]
        starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        return order.astype(np.int32), starts
    alive_c = np.ascontiguousarray(alive.astype(np.int8))
    sp_c = np.ascontiguousarray(species.astype(np.int32))
    perm = np.empty(W * A, np.int32)
    starts = np.empty(num_species + 1, np.int32)
    n = lib.mbots_compaction(alive_c, sp_c, W, A, num_species, perm, starts)
    return perm[:n].copy(), starts


def world_offsets(alive: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-world (offsets, counts) over world-major alive enumeration."""
    W, A = alive.shape
    lib = _load()
    if lib is None:
        counts = alive.sum(axis=1).astype(np.int32)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
        return offsets, counts
    alive_c = np.ascontiguousarray(alive.astype(np.int8))
    offsets = np.empty(W, np.int32)
    counts = np.empty(W, np.int32)
    lib.mbots_world_offsets(alive_c, W, A, offsets, counts)
    return offsets, counts


def inverse_perm(perm: np.ndarray, n_total: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        inv = np.full(n_total, -1, np.int32)
        inv[perm] = np.arange(perm.size, dtype=np.int32)
        return inv
    perm_c = np.ascontiguousarray(perm.astype(np.int32))
    inv = np.empty(n_total, np.int32)
    lib.mbots_inverse_perm(perm_c, perm_c.size, n_total, inv)
    return inv
