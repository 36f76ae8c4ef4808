"""ctypes binding for the native LZ76 complexity module.

Builds lz_complexity.cpp with g++ on first use (cached as a .so next to the
source); falls back to a pure-numpy implementation when no compiler is
available.  Used for action-trajectory complexity logging
(reference storage.get_action_complexity, storage.py:329-369).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), 'lz_complexity.cpp')
_SO = os.path.join(os.path.dirname(__file__), '_lz_complexity.so')
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ['g++', '-O2', '-shared', '-fPIC', '-o', _SO, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.lz76_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        lib.lz76_complexity_simple.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.lz76_complexity_simple.restype = ctypes.c_int32
        _lib = lib
    except (subprocess.CalledProcessError, OSError):
        _build_failed = True
    return _lib


def _lz76_numpy(s: np.ndarray) -> int:
    n = len(s)
    if n == 0:
        return 0
    c, i = 0, 0
    sub = s.tobytes()
    w = s.itemsize
    while i < n:
        l = 1
        while i + l <= n and sub[i * w:(i + l) * w] in sub[:(i + l - 1) * w]:
            l += 1
        c += 1
        i += l
    return c


def lz_complexity(seq) -> int:
    """LZ76 complexity of a 1-d integer sequence."""
    s = np.ascontiguousarray(np.asarray(seq, np.int32))
    lib = _load()
    if lib is None:
        return _lz76_numpy(s)
    return int(lib.lz76_complexity_simple(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(s)))


def lz_complexity_batch(flat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Batched LZ76: flat (R, S) int32, lens (R,) → (R,) int32."""
    flat = np.ascontiguousarray(np.asarray(flat, np.int32))
    lens = np.ascontiguousarray(np.asarray(lens, np.int32))
    rows, stride = flat.shape
    out = np.zeros(rows, np.int32)
    lib = _load()
    if lib is None:
        for r in range(rows):
            out[r] = _lz76_numpy(flat[r, :lens[r]])
        return out
    lib.lz76_batch(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rows, stride,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def action_complexity(actions: np.ndarray, dones: np.ndarray) -> float:
    """Mean per-episode LZ complexity of (T, N) action trajectories
    (reference storage.get_action_complexity)."""
    T, N = actions.shape
    total, n_traj = 0.0, 0
    for b in range(N):
        done_steps = [0] + list(np.nonzero(dones[:, b])[0] + 1)
        for a, bnd in zip(done_steps[:-1], done_steps[1:]):
            if bnd > a:
                total += lz_complexity(actions[a:bnd, b])
                n_traj += 1
    return total / max(n_traj, 1)
