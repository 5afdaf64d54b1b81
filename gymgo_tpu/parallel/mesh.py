"""Device-mesh utilities for sharded env stepping and learning.

The reference has no distributed layer at all (its only parallelism is a
single-process numpy batch API — SURVEY §2.4); this module supplies the
TPU-native equivalent: a ``jax.sharding.Mesh`` with an ``env`` axis for pure
data-parallel env sharding (a Go step has no cross-env communication, so
scaling is collective-free by design) and an optional ``model`` axis used by
the learner for tensor-parallel parameter sharding.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"
MODEL_AXIS = "model"


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (ENV_AXIS,),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over ``devices`` (default: all).

    With the default single axis, all devices shard the env batch.  Pass
    ``axis_sizes=(n_env, n_model)`` + ``axis_names=('env', 'model')`` for an
    actor-learner layout.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names))


def env_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (env batch) dim over the env axis; replicate rest."""
    return NamedSharding(mesh, P(ENV_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_states(states: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a (B, 6, N, N) state batch with B sharded over the env axis.

    Works on multi-process (multi-host) meshes too: when the mesh spans
    devices this process cannot address, the global array is assembled from
    per-shard callbacks (every process passes the same full ``states``).
    """
    sharding = env_sharding(mesh, states.ndim)
    local = all(
        d.process_index == jax.process_index() for d in mesh.devices.flat
    )
    if local:
        return jax.device_put(states, sharding)
    arr = np.asarray(states)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def fold_env_keys(key: jax.Array, batch_size: int) -> jax.Array:
    """Per-env RNG keys folded by *global* env index, so trajectories are
    bit-identical regardless of how the batch is sharded across hosts
    (SURVEY §7.6 multi-host determinism requirement)."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jax.numpy.arange(batch_size)
    )


def initialize_distributed(**kwargs) -> None:
    """Multi-host bootstrap (``jax.distributed.initialize`` passthrough).

    On a pod slice each host calls this before building the global mesh;
    single-host callers can skip it.
    """
    jax.distributed.initialize(**kwargs)
