"""Head-to-head policy evaluation: batched match play on device.

Pits two policies against each other over a batch of games (alternating
colors across the batch to cancel first-move advantage), entirely under
``lax.scan``: each step evaluates both policies and selects per env by whose
turn it is.  Reports win/draw rates — the evaluation leg of the AZ loop.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from gymgo_tpu.config import EnvConfig
from gymgo_tpu.core import score as _score
from gymgo_tpu.core import state as _state
from gymgo_tpu.core import step as _step


class MatchResult(NamedTuple):
    policy_a_wins: jax.Array  # int32 scalar
    policy_b_wins: jax.Array  # int32 scalar
    ties: jax.Array  # int32 scalar
    unfinished: jax.Array  # int32 scalar (hit max_steps)
    a_winrate: jax.Array  # f32 scalar over finished games


def play_match(
    key: jax.Array,
    policy_a: Callable,
    policy_b: Callable,
    config: EnvConfig,
    num_games: int,
    max_steps: int,
) -> MatchResult:
    """Play ``num_games`` games; policy_a is black in even-index games and
    white in odd-index games.  Policies: ``fn(key, states) -> actions``.
    Finished games freeze (no auto-reset), so one scan plays all games out.
    """
    states = _state.batch_init_state(num_games, config.board_size)
    a_is_black = (jnp.arange(num_games) % 2) == 0

    def body(carry, _):
        st, k = carry
        k, ka, kb = jax.random.split(k, 3)
        acts_a = policy_a(ka, st)
        acts_b = policy_b(kb, st)
        black_to_move = _state.turn(st) == 0
        a_to_move = black_to_move == a_is_black
        acts = jnp.where(a_to_move, acts_a, acts_b)
        st, _ = _step.step_states(st, acts)
        return (st, k), ()

    (final_states, _), _ = lax.scan(body, (states, key), None, length=max_steps)

    done = _state.game_ended(final_states)
    sign_black = _score.winning(final_states, config.komi)
    a_sign = jnp.where(a_is_black, sign_black, -sign_black)
    a_wins = jnp.sum((done & (a_sign > 0)).astype(jnp.int32))
    b_wins = jnp.sum((done & (a_sign < 0)).astype(jnp.int32))
    ties = jnp.sum((done & (a_sign == 0)).astype(jnp.int32))
    unfinished = jnp.sum((~done).astype(jnp.int32))
    finished = jnp.maximum(a_wins + b_wins + ties, 1)
    return MatchResult(
        policy_a_wins=a_wins,
        policy_b_wins=b_wins,
        ties=ties,
        unfinished=unfinished,
        a_winrate=a_wins.astype(jnp.float32) / finished,
    )
