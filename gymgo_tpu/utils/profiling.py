"""Profiling / timing helpers (SURVEY §5.1).

The reference's only instrumentation is a wall-clock harness; here we add
device-honest timing (checksum fetch — ``block_until_ready`` is unreliable
over tunneled PJRT backends), steps/s meters, and optional
``jax.profiler`` trace capture for Perfetto/XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


def force(tree) -> float:
    """Force completion of all leaves by fetching a scalar checksum."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    total = 0.0
    for l in leaves[:1]:  # one leaf is enough to serialize on the computation
        total += float(jnp.sum(l.astype(jnp.float32)))
    return total


def time_fn(fn: Callable, *args, reps: int = 5, warmup: int = 1, **kw) -> float:
    """Best-of-``reps`` wall time of ``fn(*args)`` with completion forced."""
    for _ in range(warmup):
        force(fn(*args, **kw))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        force(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return best


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gymgo_trace"):
    """Capture a jax.profiler trace around the block (view with XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Meter:
    """Rolling env-steps/s meter for host-side loop logging."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def update(self, env_steps: int) -> float:
        self.steps += env_steps
        dt = time.perf_counter() - self.t0
        return self.steps / dt if dt > 0 else 0.0
