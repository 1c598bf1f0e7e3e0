"""Native host-kernel bindings (C++ via ctypes, numpy fallbacks).

Counterpart of the reference's Numba tier (``polara/lib/sampler.py``,
``polara/lib/sparse.py`` host paths).  The shared library is compiled on
demand with the system toolchain and cached next to the source; every
entry point has a numpy fallback so the framework works without a
compiler (e.g. minimal containers), just slower on the host-bound paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SOURCE = os.path.join(_HERE, "host_kernels.cpp")
_LIB_PATH = os.path.join(_HERE, "libpolara_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _compile() -> bool:
    flags = ["-O3", "-std=c++17", "-shared", "-fPIC"]
    for extra in (["-fopenmp"], []):
        cmd = (["g++"] + flags + extra
               + [_SOURCE, "-o", _LIB_PATH])
        try:
            result = subprocess.run(cmd, capture_output=True, timeout=240)
        except (OSError, subprocess.TimeoutExpired):
            return False
        if result.returncode == 0:
            return True
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SOURCE)):
            if not _compile():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.build_indptr.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32,
                                     i64p]
        lib.sample_unseen_rows.argtypes = [
            i64p, i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_uint64, i32p]
        lib.sample_unseen_rows.restype = ctypes.c_int
        lib.split_top_continuous.argtypes = [i64p, f64p, ctypes.c_int64,
                                             i64p, i64p, i64p, i64p]
        lib.row_unique_counts.argtypes = [i32p, i32p, ctypes.c_int64,
                                          ctypes.c_int32, i64p]
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.pack_seen_bits.argtypes = [i32p, i32p, ctypes.c_int64,
                                       ctypes.c_int32, ctypes.c_int32,
                                       ctypes.c_int32, u32p]
        lib.group_top_k.argtypes = [i32p, f64p, ctypes.c_int64,
                                    ctypes.c_int32, ctypes.c_int32,
                                    i64p, i64p]
        _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def _as_ptr(array: np.ndarray, ctype):
    return array.ctypes.data_as(ctypes.POINTER(ctype))


def build_indptr(rows: np.ndarray, n_rows: int) -> np.ndarray:
    """CSR row pointers from row-sorted COO row ids."""
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    lib = get_lib()
    if lib is None:
        counts = np.bincount(rows, minlength=n_rows)
        return np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    indptr = np.empty(n_rows + 1, dtype=np.int64)
    lib.build_indptr(_as_ptr(rows, ctypes.c_int32), len(rows), n_rows,
                     _as_ptr(indptr, ctypes.c_int64))
    return indptr


def sample_unseen_rows(indptr: np.ndarray, indices: np.ndarray,
                       n_cols: int, k: int,
                       seed: Optional[int] = 0) -> np.ndarray:
    """For every CSR row, draw ``k`` uniform samples from the unseen
    columns (without replacement).

    RNG note: the native path seeds an independent mt19937_64 per row
    (seed ^ splitmix-constant*(row+1)) while the numpy fallback draws one
    key array per row from a single RandomState — so for the same seed
    the two paths return DIFFERENT (equally valid) samples.  Results are
    deterministic within each path; never compare draws across paths.
    """
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    n_rows = len(indptr) - 1
    lib = get_lib()
    if lib is None:
        rs = np.random.RandomState(seed)
        out = np.empty((n_rows, k), dtype=np.int32)
        for r in range(n_rows):
            seen = indices[indptr[r]:indptr[r + 1]]
            if n_cols - len(seen) < k:
                raise ValueError("some rows have fewer unseen columns "
                                 "than requested samples")
            keys = rs.rand(n_cols)
            keys[seen] = -1.0
            out[r] = np.argpartition(keys, -k)[-k:].astype(np.int32)
        return out
    out = np.empty((n_rows, k), dtype=np.int32)
    status = lib.sample_unseen_rows(
        _as_ptr(indptr, ctypes.c_int64), _as_ptr(indices, ctypes.c_int32),
        n_rows, n_cols, k, 0 if seed is None else int(seed),
        _as_ptr(out, ctypes.c_int32))
    if status != 0:
        raise ValueError("some rows have fewer unseen columns than "
                         "requested samples")
    return out


def split_top_continuous(tasks: np.ndarray, priorities: np.ndarray
                         ) -> Tuple[List[int], List[int], List[int]]:
    """Native-accelerated temporal split guard; see
    :func:`polara_tpu.ops.samplers.split_top_continuous` for semantics.
    Returns None-equivalent fallback handled by the caller."""
    tasks = np.ascontiguousarray(tasks, dtype=np.int64)
    priorities = np.ascontiguousarray(priorities, dtype=np.float64)
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(tasks)
    top = np.empty(n, dtype=np.int64)
    low = np.empty(n, dtype=np.int64)
    nonseq = np.empty(n, dtype=np.int64)
    counts = np.zeros(3, dtype=np.int64)
    lib.split_top_continuous(
        _as_ptr(tasks, ctypes.c_int64), _as_ptr(priorities, ctypes.c_double),
        n, _as_ptr(top, ctypes.c_int64), _as_ptr(low, ctypes.c_int64),
        _as_ptr(nonseq, ctypes.c_int64), _as_ptr(counts, ctypes.c_int64))
    return (top[:counts[0]].tolist(), low[:counts[1]].tolist(),
            nonseq[:counts[2]].tolist())


def row_unique_counts(rows: np.ndarray, cols: np.ndarray,
                      n_rows: int) -> np.ndarray:
    """Distinct-column counts per row of row-sorted events."""
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    lib = get_lib()
    if lib is None:
        import pandas as pd
        counts = (pd.DataFrame({"r": rows, "c": cols})
                  .groupby("r")["c"].nunique())
        out = np.zeros(n_rows, dtype=np.int64)
        out[counts.index.values] = counts.values
        return out
    out = np.empty(n_rows, dtype=np.int64)
    lib.row_unique_counts(_as_ptr(rows, ctypes.c_int32),
                          _as_ptr(cols, ctypes.c_int32), len(rows), n_rows,
                          _as_ptr(out, ctypes.c_int64))
    return out


def pack_seen_bits(rows: np.ndarray, cols: np.ndarray, n_rows: int,
                   n_cols: int, tile_n: int = 4096) -> Optional[np.ndarray]:
    """Native striped bitmask packing (see ops.pallas.pack_seen_bits);
    returns None when the library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "pack_seen_bits"):
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    w = tile_n // 32
    n_tiles = max(1, -(-n_cols // tile_n))
    out = np.zeros((n_rows, n_tiles * w), dtype=np.uint32)
    lib.pack_seen_bits(_as_ptr(rows, ctypes.c_int32),
                       _as_ptr(cols, ctypes.c_int32), len(rows), n_rows,
                       tile_n, n_tiles * w,
                       _as_ptr(out, ctypes.c_uint32))
    return out


def group_top_k(groups: np.ndarray, values: np.ndarray, n_groups: int,
                k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-group top-k event selection (the scale path for holdout
    sampling).  Returns (event indices, per-group counts); among ties the
    later event wins (pandas ``nlargest(keep='last')`` convention).
    Falls back to a numpy argsort when the library is unavailable."""
    groups = np.ascontiguousarray(groups, dtype=np.int32)
    values = np.ascontiguousarray(values, dtype=np.float64)
    if k <= 0:
        return (np.empty(0, dtype=np.int64),
                np.zeros(n_groups, dtype=np.int64))
    lib = get_lib()
    if lib is None:
        order = np.lexsort((np.arange(len(groups)), -values, groups))
        sorted_groups = groups[order]
        starts = np.searchsorted(sorted_groups, np.arange(n_groups))
        ends = np.searchsorted(sorted_groups, np.arange(n_groups),
                               side="right")
        # within a group, equal values must prefer later event indices
        out, counts = [], np.zeros(n_groups, dtype=np.int64)
        for g in range(n_groups):
            seg = order[starts[g]:ends[g]]
            seg = sorted(seg, key=lambda e: (-values[e], -e))[:k]
            out.extend(seg)
            counts[g] = len(seg)
        return np.asarray(out, dtype=np.int64), counts
    out_idx = np.empty(min(len(groups), n_groups * k), dtype=np.int64)
    out_count = np.zeros(n_groups, dtype=np.int64)
    lib.group_top_k(_as_ptr(groups, ctypes.c_int32),
                    _as_ptr(values, ctypes.c_double), len(groups),
                    n_groups, k, _as_ptr(out_idx, ctypes.c_int64),
                    _as_ptr(out_count, ctypes.c_int64))
    total = int(out_count.sum())
    return out_idx[:total], out_count
