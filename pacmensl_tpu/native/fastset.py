"""Python wrapper over the native fastset state directory.

:class:`FastSet` is the single-address-space analogue of the reference's
Zoltan distributed directory (``src/StateSet/StateSetBase.cpp:630``,
``Zoltan_DD_Update/Find`` at ``:209-234,330``): a hash table from the
mixed-radix state key to the state's global index (= insertion rank).
Backed by C++ (``fastset.cpp``) when the toolchain is available, with a
pure-numpy fallback (sorted-key binary search) otherwise.

Use :func:`available` to test for the native backend; both backends share
this interface exactly, so callers never branch.
"""
from __future__ import annotations

import ctypes

import numpy as np

from . import build


def available() -> bool:
    return build.load() is not None


def _as_i64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int64))


class FastSet:
    """Insertion-ordered int64 key set: key -> insertion rank."""

    def __init__(self, capacity_hint: int = 1024):
        lib = build.load()
        self._lib = lib
        if lib is not None:
            self._h = lib.fastset_create(int(max(capacity_hint, 1)))
        else:                       # numpy fallback state
            self._keys = np.zeros((0,), np.int64)       # insertion order
            self._sorted = np.zeros((0,), np.int64)
            self._rank = np.zeros((0,), np.int64)

    def __del__(self):
        lib = getattr(self, "_lib", None)
        h = getattr(self, "_h", None)
        if lib is not None and h:
            lib.fastset_destroy(h)
            self._h = None

    def __len__(self) -> int:
        if self._lib is not None:
            return int(self._lib.fastset_size(self._h))
        return self._keys.shape[0]

    # ---------------------------------------------------------------- ops
    def insert(self, keys) -> np.ndarray:
        """Insert keys; returns a bool mask of the newly-added ones
        (first occurrence within the batch wins; negative keys are
        rejected, mirroring the invalid-state codes of sub2ind)."""
        keys = _as_i64(keys)
        n = keys.shape[0]
        if self._lib is not None:
            out = np.empty(n, dtype=np.uint8)
            self._lib.fastset_insert(
                self._h,
                keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            return out.astype(bool)
        # numpy fallback: dedupe within batch, then against members
        new = np.zeros(n, dtype=bool)
        valid = keys >= 0
        _, first = np.unique(keys[valid], return_index=True)
        cand = np.zeros(n, dtype=bool)
        cand[np.flatnonzero(valid)[first]] = True
        if self._sorted.size:
            pos = np.searchsorted(self._sorted, keys)
            pos = np.clip(pos, 0, self._sorted.size - 1)
            cand &= ~((self._sorted[pos] == keys) & valid)
        new[:] = cand
        if new.any():
            fresh = keys[new]
            ranks = self._keys.shape[0] + np.arange(fresh.shape[0])
            self._keys = np.concatenate([self._keys, fresh])
            allk = np.concatenate([self._sorted_keys_raw(), fresh])
            allr = np.concatenate([self._rank, ranks])
            order = np.argsort(allk, kind="stable")
            self._sorted = allk[order]
            self._rank = allr[order]
        return new

    def _sorted_keys_raw(self) -> np.ndarray:
        return self._sorted

    def lookup(self, keys) -> np.ndarray:
        """Insertion rank of each key, or -1 if absent/invalid."""
        keys = _as_i64(keys)
        n = keys.shape[0]
        if self._lib is not None:
            out = np.empty(n, dtype=np.int64)
            self._lib.fastset_lookup(
                self._h,
                keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            return out
        out = np.full(n, -1, dtype=np.int64)
        if self._sorted.size == 0:
            return out
        valid = keys >= 0
        pos = np.searchsorted(self._sorted, keys[valid])
        pos = np.clip(pos, 0, self._sorted.size - 1)
        hit = self._sorted[pos] == keys[valid]
        out[valid] = np.where(hit, self._rank[pos], -1)
        return out


def sub2ind_native(nmax, states) -> np.ndarray:
    """Native mixed-radix linearization (sys.indexing.sub2ind semantics);
    falls back to the numpy implementation when the library is absent."""
    lib = build.load()
    nmax = _as_i64(nmax)
    states = np.ascontiguousarray(
        np.atleast_2d(np.asarray(states, dtype=np.int64)))
    if lib is None:
        from ..sys import indexing
        return indexing.sub2ind(nmax, states)
    n, dim = states.shape
    out = np.empty(n, dtype=np.int64)
    p = ctypes.POINTER(ctypes.c_int64)
    lib.fastset_sub2ind(nmax.ctypes.data_as(p), dim,
                        states.ctypes.data_as(p), n,
                        out.ctypes.data_as(p))
    return out
