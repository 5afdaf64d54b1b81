"""Batched rollout metrics (SURVEY §5.5): on-device counters aggregated
across steps, fetched host-side for periodic logging.

Functional accumulator: fold ``StepResult``s into a ``RolloutMetrics``
pytree inside the scan; everything stays on device until logged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RolloutMetrics(NamedTuple):
    env_steps: jax.Array  # int32 scalar
    games_finished: jax.Array  # int32 scalar
    stones_captured: jax.Array  # int32 scalar
    invalid_actions: jax.Array  # int32 scalar
    black_wins: jax.Array  # int32 scalar
    white_wins: jax.Array  # int32 scalar
    ties: jax.Array  # int32 scalar


def init_metrics() -> RolloutMetrics:
    z = jnp.zeros((), jnp.int32)
    return RolloutMetrics(z, z, z, z, z, z, z)


def update_metrics(m: RolloutMetrics, step_result) -> RolloutMetrics:
    """Fold one StepResult (from batch_env.batch_step) into the counters.

    ``games_finished`` counts done transitions this step (done flags of envs
    that just ended); with auto-reset each finished game counts once.
    """
    done = step_result.done
    # count each game once: it must have ended on THIS step
    newly_done = done & ~step_result.was_done & ~step_result.invalid_action
    reward = step_result.reward
    return RolloutMetrics(
        env_steps=m.env_steps + done.shape[0],
        games_finished=m.games_finished + jnp.sum(newly_done.astype(jnp.int32)),
        stones_captured=m.stones_captured + jnp.sum(step_result.num_captured),
        invalid_actions=m.invalid_actions
        + jnp.sum(step_result.invalid_action.astype(jnp.int32)),
        black_wins=m.black_wins
        + jnp.sum((newly_done & (reward > 0)).astype(jnp.int32)),
        white_wins=m.white_wins
        + jnp.sum((newly_done & (reward < 0)).astype(jnp.int32)),
        ties=m.ties + jnp.sum((newly_done & (reward == 0)).astype(jnp.int32)),
    )


def format_metrics(m: RolloutMetrics) -> str:
    return (
        f"steps={int(m.env_steps):,} games={int(m.games_finished):,} "
        f"captures={int(m.stones_captured):,} "
        f"B/W/T={int(m.black_wins)}/{int(m.white_wins)}/{int(m.ties)} "
        f"invalid={int(m.invalid_actions)}"
    )
