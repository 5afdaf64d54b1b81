"""Build + load the native C++ host engine via ctypes.

The shared library is compiled on demand with g++ -O3 (cached beside the
source, keyed by source mtime) — no pybind11/pip dependencies.  See
go_engine.cc for semantics; exactness vs the JAX kernels is enforced by
tests/test_native_engine.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "go_engine.cc")
_LOCK = threading.Lock()
_LIB = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> str:
    so_path = os.path.join(_HERE, "_go_engine.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    base = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", so_path, _SRC]
    last = None
    # OpenMP enables the batch-parallel path; fall back to serial if the
    # toolchain lacks it.
    for cmd in (base + ["-fopenmp"], base):
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            return so_path
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            last = e
    detail = getattr(last, "stderr", str(last))
    raise NativeUnavailable(f"native engine build failed: {detail}") from last


def load():
    """Return the loaded ctypes library (singleton), building if needed."""
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build())
            i8p = ctypes.POINTER(ctypes.c_int8)
            i32p = ctypes.POINTER(ctypes.c_int)
            lib.gogo_next_state.argtypes = [i8p, ctypes.c_int, ctypes.c_int, i8p]
            lib.gogo_next_state.restype = ctypes.c_int
            lib.gogo_areas.argtypes = [i8p, ctypes.c_int, i32p, i32p]
            lib.gogo_areas.restype = ctypes.c_int
            lib.gogo_batch_next_states.argtypes = [
                i8p, ctypes.c_int, ctypes.c_int, i32p, i8p, i32p,
            ]
            lib.gogo_batch_next_states.restype = ctypes.c_int
            lib.gogo_batch_areas.argtypes = [
                i8p, ctypes.c_int, ctypes.c_int, i32p, i32p,
            ]
            lib.gogo_batch_areas.restype = ctypes.c_int
            lib.gogo_max_threads.argtypes = []
            lib.gogo_max_threads.restype = ctypes.c_int
            lib.gogo_set_threads.argtypes = [ctypes.c_int]
            lib.gogo_set_threads.restype = None
            threads = os.environ.get("GYMGO_NATIVE_THREADS")
            if threads:
                lib.gogo_set_threads(int(threads))
            _LIB = lib
    return _LIB


def _as_i8(state) -> np.ndarray:
    arr = np.ascontiguousarray(np.asarray(state), dtype=np.int8)
    return arr


class NativeGoEngine:
    """Single/batch Go stepping on the host in microseconds.

    API mirrors the functional core: states are (6, N, N) or (B, 6, N, N)
    numpy int-like arrays of 0/1.
    """

    def __init__(self, board_size: int):
        if board_size > 32:
            raise ValueError("native engine supports N <= 32")
        self.n = board_size
        self._lib = load()

    def next_state(self, state, action: int):
        """Returns (new_state int8 (6,N,N), status) — status 0 ok, 1 invalid
        move, 2 game already over (state returned unchanged then)."""
        s = _as_i8(state)
        out = np.empty_like(s)
        status = self._lib.gogo_next_state(
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            self.n,
            int(action),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        )
        if status != 0:
            return s, status
        return out, 0

    def batch_next_states(self, states, actions):
        s = _as_i8(states)
        b = s.shape[0]
        acts = np.ascontiguousarray(np.asarray(actions), dtype=np.int32)
        out = np.empty_like(s)
        status = np.empty((b,), dtype=np.int32)
        rc = self._lib.gogo_batch_next_states(
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            b,
            self.n,
            acts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        assert rc == 0
        return out, status

    def areas(self, state):
        s = _as_i8(state)
        ba = ctypes.c_int()
        wa = ctypes.c_int()
        self._lib.gogo_areas(
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            self.n,
            ctypes.byref(ba),
            ctypes.byref(wa),
        )
        return ba.value, wa.value

    def batch_areas(self, states):
        """Trump-Taylor areas for a (B, 6, N, N) batch -> two int32 (B,)."""
        s = _as_i8(states)
        b = s.shape[0]
        ba = np.empty((b,), dtype=np.int32)
        wa = np.empty((b,), dtype=np.int32)
        rc = self._lib.gogo_batch_areas(
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            b,
            self.n,
            ba.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            wa.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        assert rc == 0
        return ba, wa

    @staticmethod
    def max_threads() -> int:
        """OpenMP worker count the batch paths will use (1 = serial build).

        Override with GYMGO_NATIVE_THREADS or OMP_NUM_THREADS."""
        return int(load().gogo_max_threads())
