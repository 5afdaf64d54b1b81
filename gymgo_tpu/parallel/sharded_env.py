"""Mesh-sharded batched Go env: thousands of games spread over chips/hosts.

Wraps the pure ``batch_step`` with sharding constraints so XLA's SPMD
partitioner keeps every per-env computation local to the shard that owns it.
The step itself is collective-free; only user-level reductions (e.g. summed
rewards, games-finished counters) cross chips, riding ICI via ``psum`` that
XLA inserts from the sharding annotations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gymgo_tpu.config import EnvConfig
from gymgo_tpu.core import actions as _actions
from gymgo_tpu.core import state as _state
from gymgo_tpu.env import batch_env as _batch_env
from gymgo_tpu.parallel import mesh as _mesh


class ShardedGoEnv:
    """BatchGoEnv whose state batch lives sharded over a device mesh.

    ``config.batch_size`` is the *global* env count and must divide evenly
    over the mesh's env axis.
    """

    def __init__(self, config: EnvConfig, mesh: Mesh | None = None):
        self.config = config
        self.mesh = mesh if mesh is not None else _mesh.make_mesh()
        env_axis = self.mesh.shape[_mesh.ENV_AXIS]
        if config.batch_size % env_axis != 0:
            raise ValueError(
                f"batch_size {config.batch_size} not divisible by env axis {env_axis}"
            )
        self._state_sharding = _mesh.env_sharding(self.mesh, 4)
        # batch_step has no RNG, so the WHOLE transition runs one program
        # per shard: local flood convergence, zero collectives (see
        # batch_env.shard_over_envs / tests/test_zero_collective.py).
        step = _batch_env.shard_over_envs(
            functools.partial(_batch_env.batch_step, config=config), self.mesh
        )
        self._step = jax.jit(
            step,
            in_shardings=(self._state_sharding, _mesh.env_sharding(self.mesh, 1)),
            out_shardings=None,
            donate_argnums=(0,),
        )
        self._rollout = jax.jit(
            functools.partial(_batch_env.rollout, config=config, mesh=self.mesh),
            static_argnames=("num_steps", "policy_fn", "collect_obs"),
        )

    def reset(self) -> jax.Array:
        states = _state.batch_init_state(self.config.batch_size, self.config.board_size)
        return _mesh.shard_states(states, self.mesh)

    def step(self, states, actions):
        return self._step(states, jnp.asarray(actions, jnp.int32))

    def rollout(self, key, states, num_steps: int, **kw):
        return self._rollout(key, states, num_steps, **kw)

    def uniform_random_actions(self, key, states):
        return jax.jit(_actions.uniform_random_actions)(key, states)
