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
            cursor=jnp.zeros((), jnp.int32),
            filled=jnp.zeros((), jnp.int32),
        )

    def add(self, state: ReplayState, obs, policy, value) -> ReplayState:
        """Append M rows (wrapping).  Shapes: obs (M,6,N,N), policy (M,A),
        value (M,)."""
        m = obs.shape[0]
        idx = (state.cursor + jnp.arange(m)) % self.capacity
        return ReplayState(
            obs=state.obs.at[idx].set(obs.astype(jnp.int8)),
            policy=state.policy.at[idx].set(policy),
            value=state.value.at[idx].set(value),
            cursor=(state.cursor + m) % self.capacity,
            filled=jnp.minimum(state.filled + m, self.capacity),
        )

    def sample(self, state: ReplayState, key: jax.Array, batch_size: int):
        """Uniform sample with replacement over the filled region."""
        idx = jax.random.randint(
            key, (batch_size,), 0, jnp.maximum(state.filled, 1)
        )
        return state.obs[idx], state.policy[idx], state.value[idx]
