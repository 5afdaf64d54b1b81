"""On-device circular replay buffer for self-play training tuples.

Fixed-capacity, fully functional (buffer state is a pytree of jnp arrays),
so it lives sharded on the same mesh as the envs and feeds the learner
without host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ReplayState(NamedTuple):
    obs: jax.Array  # (C, 6, N, N) int8
    policy: jax.Array  # (C, A) f32
    value: jax.Array  # (C,) f32
    mask: jax.Array  # (C,) bool: row is a live-game step (trains the loss)
    vmask: jax.Array  # (C,) bool: row also trains the VALUE head (off for
    # truncated-tail rows under --value-grounded-only)
    cursor: jax.Array  # int32 scalar: next write slot
    filled: jax.Array  # int32 scalar: number of valid rows


class ReplayBuffer:
    def __init__(self, capacity: int, board_size: int):
        self.capacity = capacity
        self.board_size = board_size

    def init(self) -> ReplayState:
        n = self.board_size
        return ReplayState(
            obs=jnp.zeros((self.capacity, 6, n, n), jnp.int8),
            policy=jnp.zeros((self.capacity, n * n + 1), jnp.float32),
            value=jnp.zeros((self.capacity,), jnp.float32),
            mask=jnp.zeros((self.capacity,), jnp.bool_),
            vmask=jnp.zeros((self.capacity,), jnp.bool_),
            cursor=jnp.zeros((), jnp.int32),
            filled=jnp.zeros((), jnp.int32),
        )

    def add(self, state: ReplayState, obs, policy, value, mask=None,
            vmask=None) -> ReplayState:
        """Append M rows (wrapping).  Shapes: obs (M,6,N,N), policy (M,A),
        value (M,), mask/vmask (M,) bool (defaults: all live / vmask=mask).
        Dead rows (a game boundary step under auto-reset) are stored but
        flagged so the learner's loss masks them out; vmask=False keeps a
        row policy-only (truncated-tail value exclusion)."""
        m = obs.shape[0]
        if mask is None:
            mask = jnp.ones((m,), jnp.bool_)
        if vmask is None:
            vmask = mask
        idx = (state.cursor + jnp.arange(m)) % self.capacity
        return ReplayState(
            obs=state.obs.at[idx].set(obs.astype(jnp.int8)),
            policy=state.policy.at[idx].set(policy),
            value=state.value.at[idx].set(value),
            mask=state.mask.at[idx].set(mask),
            vmask=state.vmask.at[idx].set(vmask),
            cursor=(state.cursor + m) % self.capacity,
            filled=jnp.minimum(state.filled + m, self.capacity),
        )

    def sample(self, state: ReplayState, key: jax.Array, batch_size: int):
        """Uniform sample with replacement over the filled region.
        Returns (obs, policy, value, mask, vmask)."""
        idx = jax.random.randint(
            key, (batch_size,), 0, jnp.maximum(state.filled, 1)
        )
        return (
            state.obs[idx], state.policy[idx], state.value[idx],
            state.mask[idx], state.vmask[idx],
        )
