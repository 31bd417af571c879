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
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    for name, ptr in (("mbots_gather_f32", f32p), ("mbots_gather_i32", i32p),
                      ("mbots_gather_u8", u8p)):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [ptr, i32p, ctypes.c_int32, ctypes.c_int32, ptr]
    for name, ptr in (("mbots_scatter_f32", f32p),
                      ("mbots_scatter_i32", i32p)):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [ptr, i32p, ctypes.c_int32, ctypes.c_int32, ptr]
    _lib = lib
    return _lib


_GATHER_BY_DTYPE = {np.dtype(np.float32): "mbots_gather_f32",
                    np.dtype(np.int32): "mbots_gather_i32",
                    np.dtype(np.uint8): "mbots_gather_u8"}
_SCATTER_BY_DTYPE = {np.dtype(np.float32): "mbots_scatter_f32",
                     np.dtype(np.int32): "mbots_scatter_i32"}


def gather_rows(src: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """out[r] = src[perm[r]] over flattened rows — the export gather
    (mbots_gather_*), numpy fancy-indexing fallback."""
    rows = src.reshape(src.shape[0], -1)
    lib = _load()
    name = _GATHER_BY_DTYPE.get(rows.dtype)
    if lib is None or name is None:
        return np.ascontiguousarray(src[perm])
    rows_c = np.ascontiguousarray(rows)
    perm_c = np.ascontiguousarray(perm.astype(np.int32))
    out = np.empty((perm.size, rows.shape[1]), rows.dtype)
    getattr(lib, name)(rows_c, perm_c, perm.size, rows.shape[1], out)
    return out.reshape((perm.size,) + src.shape[1:])


def scatter_rows(src: np.ndarray, perm: np.ndarray, dst: np.ndarray) -> None:
    """dst[perm[r]] = src[r] in place — the write-back scatter
    (mbots_scatter_*), numpy fallback."""
    lib = _load()
    name = _SCATTER_BY_DTYPE.get(dst.dtype)
    # A non-contiguous dst would make reshape() return a COPY and the native
    # scatter would be silently lost — fall back to numpy in that case.
    if lib is None or name is None or not dst.flags['C_CONTIGUOUS']:
        dst[perm] = src
        return
    rows_dst = dst.reshape(dst.shape[0], -1)
    rows_src = np.ascontiguousarray(src.reshape(src.shape[0], -1))
    perm_c = np.ascontiguousarray(perm.astype(np.int32))
    getattr(lib, name)(rows_src, perm_c, perm.size, rows_dst.shape[1],
                       rows_dst)


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
