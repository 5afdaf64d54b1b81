"""The batched, jitted product API: thousands of Go games in lockstep.

This is the TPU-native replacement for the reference's ``batch_*`` numpy path
(/root/reference/gym_go/gogame.py:90-150): one fused XLA program per step,
auto-reset semantics for continuous rollouts, and ``lax.scan`` trajectory
collection with zero Python in the loop.  States are plain ``jnp`` arrays, so
the env composes freely with ``jax.sharding`` (see gymgo_tpu.parallel).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


from gymgo_tpu.config import EnvConfig, HEURISTIC, REAL
from gymgo_tpu.core import actions as _actions
from gymgo_tpu.core import score as _score
from gymgo_tpu.core import state as _state
from gymgo_tpu.core import step as _step


class StepResult(NamedTuple):
    """Outputs of one batched step (all leading dim B)."""

    obs: jax.Array  # int8 (B, 6, N, N): post-step states
    reward: jax.Array  # float32 (B,): REAL/HEURISTIC reward, black's view
    done: jax.Array  # bool (B,): game over after this step
    invalid_action: jax.Array  # bool (B,): action was rejected (env frozen)
    was_done: jax.Array  # bool (B,): env was already finished at entry
    num_captured: jax.Array  # int32 (B,): stones captured by this step
    black_area: jax.Array  # int32 (B,): Trump-Taylor area (post-step state)
    white_area: jax.Array  # int32 (B,): free byproduct of the step's flood


def reward_from_areas(black_area, white_area, done, config: EnvConfig):
    """Reward from the step's fused Trump-Taylor areas (go_env.py:128-149)."""
    n = config.board_size
    kc = black_area.astype(jnp.float32) - white_area.astype(jnp.float32) - config.komi
    if config.reward_method == REAL:
        return jnp.where(done, jnp.sign(kc), 0.0)
    if config.reward_method == HEURISTIC:
        end_reward = jnp.where(kc > 0, 1.0, -1.0) * (n * n)
        return jnp.where(done, end_reward, kc)
    raise ValueError(config.reward_method)


def batch_step(
    states: jax.Array, actions: jax.Array, config: EnvConfig
) -> tuple[jax.Array, StepResult]:
    """Pure batched transition: auto-reset (optional) -> move -> reward."""
    if config.auto_reset:
        done_pre = _state.game_ended(states)
        states = jnp.where(
            done_pre[:, None, None, None],
            jnp.zeros_like(states),
            states,
        )
    new_states, info = _step.step_states(states, actions)
    done = _state.game_ended(new_states)
    reward = reward_from_areas(info.black_area, info.white_area, done, config)
    return new_states, StepResult(
        obs=new_states,
        reward=reward,
        done=done,
        invalid_action=info.invalid_action,
        was_done=info.was_done,
        num_captured=info.num_captured,
        black_area=info.black_area,
        white_area=info.white_area,
    )


class Rollout(NamedTuple):
    """A scanned trajectory (leading dim T = num_steps)."""

    actions: jax.Array  # int32 (T, B)
    rewards: jax.Array  # float32 (T, B)
    dones: jax.Array  # bool (T, B)
    final_states: jax.Array  # int8 (B, 6, N, N)
    obs: Optional[jax.Array] = None  # int8 (T, B, 6, N, N) when collected


def shard_over_envs(fn: Callable, mesh) -> Callable:
    """Run ``fn`` (pure, per-env semantics, every arg/result batched on the
    leading env dim) as one program per mesh shard via ``jax.shard_map``.

    This is how the sharded paths stay literally collective-free: the flood
    fixpoint loops' "any bit changed" convergence conditions are batch-wide
    reduces, which the SPMD partitioner must otherwise replicate with ONE
    scalar all-reduce per executed substep (~40/step at 19x19 — pure ICI/DCN
    latency on a pod).  Under shard_map each shard keeps a local condition:
    zero collectives (asserted by tests/test_zero_collective.py), and the
    per-shard batch-max trip count is <= the global batch-max for free.
    """
    from jax.sharding import PartitionSpec as P

    env_axis = mesh.axis_names[0]
    spec = P(env_axis)
    # check_vma off: the flood loops seed their "changed" carry with a
    # replicated True that immediately becomes shard-varying — semantically
    # fine (everything here is per-env), but the varying-axis type checker
    # would demand pcast noise inside mesh-agnostic core code.
    return jax.shard_map(
        fn, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False
    )


def rollout(
    key: jax.Array,
    states: jax.Array,
    num_steps: int,
    config: EnvConfig,
    policy_fn: Optional[Callable] = None,
    collect_obs: bool = False,
    mesh=None,
) -> Rollout:
    """Roll ``num_steps`` lockstep moves with ``lax.scan``.

    ``policy_fn(key, states) -> actions`` defaults to uniform-random over
    valid moves.  With ``config.auto_reset`` finished games restart in place,
    making this the continuous self-play driver.

    The scan carries the bandwidth-optimal planes state (half the traffic
    of the packed tensor); the packed layout is materialized only for
    custom ``policy_fn``s and collected observations, keeping the default
    (uniform-random) path maximally lean.

    With ``mesh`` set, the per-env transition work runs under
    ``shard_over_envs`` so the compiled scan contains no collectives; RNG
    draws stay OUTSIDE the shard_map region (a (B,) draw from one key is
    positionally global — running it per shard would duplicate streams and
    break the sharding-invariance contract of tests/test_sharding.py).
    """
    step_planes = _step.step_planes
    seed_carry = lambda ps: ps._replace(
        atari=_step.init_atari(ps), ko_surr=_step.init_ko_surr(ps)
    )
    if mesh is not None:
        step_planes = shard_over_envs(_step.step_planes, mesh)
        seed_carry = shard_over_envs(seed_carry, mesh)

    def body(carry, _):
        ps, k = carry
        k, sub = jax.random.split(k)
        if config.auto_reset:
            ps = jax.tree.map(
                lambda x: jnp.where(
                    ps.done.reshape((-1,) + (1,) * (x.ndim - 1)),
                    jnp.zeros_like(x),
                    x,
                ),
                ps,
            )
        if policy_fn is None:
            if "sampler" in _step._ABLATE:
                acts = jnp.zeros(ps.done.shape, jnp.int32)
            else:
                acts = _actions.uniform_random_actions_planes(sub, ps)
        else:
            acts = policy_fn(sub, _step.states_from_planes(ps))
        ps, info = step_planes(ps, acts)
        done = ps.done
        reward = reward_from_areas(info.black_area, info.white_area, done, config)
        out = (acts, reward, done) + (
            (_step.states_from_planes(ps),) if collect_obs else ()
        )
        return (ps, k), out

    ps0 = _step.planes_from_states(states)
    # Seed the carried-capture encoding once; each step then refreshes it as
    # a free byproduct of its classification flood, eliminating the per-step
    # capture flood entirely inside the scan.
    ps0 = seed_carry(ps0)
    (final_ps, _), outs = lax.scan(body, (ps0, key), None, length=num_steps)
    actions, rewards, dones = outs[:3]
    obs = outs[3] if collect_obs else None
    return Rollout(
        actions=actions,
        rewards=rewards,
        dones=dones,
        final_states=_step.states_from_planes(final_ps, states.dtype),
        obs=obs,
    )


class BatchGoEnv:
    """Convenience stateful wrapper around the pure ``batch_step``.

    Keeps compiled step/rollout callables per config; states stay on device.
    """

    def __init__(self, config: EnvConfig):
        self.config = config
        self._step = jax.jit(
            functools.partial(batch_step, config=config), donate_argnums=(0,)
        )
        self._rollout = jax.jit(
            functools.partial(rollout, config=config),
            static_argnames=("num_steps", "policy_fn", "collect_obs"),
        )
        self._random_actions = jax.jit(_actions.uniform_random_actions)

    def reset(self) -> jax.Array:
        return _state.batch_init_state(self.config.batch_size, self.config.board_size)

    def step(self, states: jax.Array, actions: jax.Array):
        return self._step(states, jnp.asarray(actions, jnp.int32))

    def uniform_random_actions(self, key, states):
        return self._random_actions(key, states)

    def rollout(self, key, states, num_steps: int, **kw) -> Rollout:
        return self._rollout(key, states, num_steps, **kw)

    # accessors mirroring the single-env surface, batched
    def valid_moves(self, states):
        return _actions.batch_valid_moves(states)

    def areas(self, states):
        return _score.areas(states)

    def winning(self, states):
        return _score.winning(states, self.config.komi)
