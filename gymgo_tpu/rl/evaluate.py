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

from gymgo_tpu import govars
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
    # area-adjudicated tallies over ALL games: unfinished games are scored
    # by Trump-Taylor area (minus komi) at the move cap — the standard
    # adjudication when two near-equal nets pad past the cap (the 19x19
    # iter-830 vs iter-780 match left 68/128 games unfinished; dropping
    # them throws away half the signal).  For finished games the area sign
    # IS the game result, so scored == finished tallies + adjudicated rest.
    a_scored_wins: jax.Array  # int32 scalar
    b_scored_wins: jax.Array  # int32 scalar
    scored_ties: jax.Array  # int32 scalar
    a_scored_winrate: jax.Array  # f32 scalar over all games


def play_match(
    key: jax.Array,
    policy_a: Callable,
    policy_b: Callable,
    config: EnvConfig,
    num_games: int,
    max_steps: int,
    opening_moves: int = 0,
    with_states: bool = False,
) -> MatchResult:
    """Play ``num_games`` games; policy_a is black in even-index games and
    white in odd-index games.  Policies: ``fn(key, states) -> actions``.
    Finished games freeze (no auto-reset), so one scan plays all games out.

    ``opening_moves`` > 0 forces the first k plies to uniform-random legal
    BOARD moves, with the same random opening shared by each color-swapped
    pair (games 2i and 2i+1): every opening is played once with A as black
    and once with A as white.  Without it, two deterministic-ish search
    policies replay near-identical game families from the empty board and
    head-to-head results measure style lock, not strength (the measured
    13x13 ladder non-transitivity, BENCHMARKS.md) — opening diversity is
    the standard fix (cf. computer-Go match practice).
    """
    states = _state.batch_init_state(num_games, config.board_size)
    a_is_black = (jnp.arange(num_games) % 2) == 0
    key, opening_key = jax.random.split(key)
    pair_ids = jnp.arange(num_games) // 2
    n = config.board_size

    def body(carry, t):
        st, k = carry
        k, ka, kb = jax.random.split(k, 3)
        acts_a = policy_a(ka, st)
        acts_b = policy_b(kb, st)
        black_to_move = _state.turn(st) == 0
        a_to_move = black_to_move == a_is_black
        acts = jnp.where(a_to_move, acts_a, acts_b)
        if opening_moves > 0:
            # per-(step, pair) keys: paired games draw identical gumbel
            # noise over identical boards, so their openings coincide
            step_key = jax.random.fold_in(opening_key, t)
            pair_keys = jax.vmap(
                lambda i: jax.random.fold_in(step_key, i))(pair_ids)
            g = jax.vmap(
                lambda kk: jax.random.gumbel(kk, (n * n,)))(pair_keys)
            from gymgo_tpu.core import actions as _actions_mod
            vm = _actions_mod.batch_valid_moves(st)[:, :-1] > 0
            forced = jnp.argmax(
                jnp.where(vm, g, -jnp.inf), axis=1).astype(acts.dtype)
            acts = jnp.where(t < opening_moves, forced, acts)
        st, _ = _step.step_states(st, acts)
        return (st, k), ()

    (final_states, _), _ = lax.scan(
        body, (states, key), jnp.arange(max_steps))

    done = _state.game_ended(final_states)
    sign_black = _score.winning(final_states, config.komi)
    a_sign = jnp.where(a_is_black, sign_black, -sign_black)
    a_wins = jnp.sum((done & (a_sign > 0)).astype(jnp.int32))
    b_wins = jnp.sum((done & (a_sign < 0)).astype(jnp.int32))
    ties = jnp.sum((done & (a_sign == 0)).astype(jnp.int32))
    unfinished = jnp.sum((~done).astype(jnp.int32))
    finished = jnp.maximum(a_wins + b_wins + ties, 1)
    a_scored = jnp.sum((a_sign > 0).astype(jnp.int32))
    b_scored = jnp.sum((a_sign < 0).astype(jnp.int32))
    scored_ties = jnp.sum((a_sign == 0).astype(jnp.int32))
    result = MatchResult(
        policy_a_wins=a_wins,
        policy_b_wins=b_wins,
        ties=ties,
        unfinished=unfinished,
        a_winrate=a_wins.astype(jnp.float32) / finished,
        a_scored_wins=a_scored,
        b_scored_wins=b_scored,
        scored_ties=scored_ties,
        a_scored_winrate=a_scored.astype(jnp.float32) / num_games,
    )
    if with_states:
        return result, final_states
    return result


def with_pass_to_win(policy_fn, komi: float = 0.0):
    """Wrap a policy with the sound match-play pass rule: pass ONLY when it
    immediately ends the game as a win (previous move was a pass and the
    mover leads on Trump-Taylor area minus komi), or when no board move is
    legal; otherwise always play a board move.

    Why this exists: self-play nets learn "pass when ahead", which is
    equilibrium play against themselves (the opponent net agrees the game
    is over and passes back) but loses tempo after tempo against any
    opponent who keeps playing — measured on 7x7, the SAME checkpoint went
    from 0.11 to 0.88 winrate vs uniform-random when wrapped (see
    BENCHMARKS.md).  A pass that does not end the game is never forced, so
    the wrapped policy cedes zero tempi; a pass that does end it is taken
    exactly when it seals the win.

    A replaced non-winning pass falls back to a uniform-random legal board
    move.  For a POLICY-aware replacement, give the inner policy a huge
    ``pass_min_stones`` (all search policies accept it) so its own ranking
    picks the best board move and the wrapper only ever ADDS the winning
    pass — this is what train.py's eval does."""
    from gymgo_tpu.core import actions as _actions_mod

    def wrapped(key, states):
        n = states.shape[-1]
        key, fb_key = jax.random.split(key)
        acts = policy_fn(key, states)
        valid = _actions_mod.batch_valid_moves(states) > 0
        board_any = jnp.any(valid[:, :-1], axis=1)
        prev_passed = states[:, govars.PASS_CHNL, 0, 0] != 0
        black_area, white_area = _score.areas(states)
        mover_white = _state.turn(states) == 1
        lead = jnp.where(
            mover_white,
            white_area.astype(jnp.float32) - black_area + komi,
            black_area.astype(jnp.float32) - white_area - komi,
        )
        win_by_pass = prev_passed & (lead > 0)
        pass_idx = jnp.int32(n * n)
        # force the winning pass; otherwise never pass while a move exists
        acts = jnp.where(win_by_pass, pass_idx, acts)
        is_pass = acts == pass_idx
        # uniform-random legal board move — argmax of iid Gumbel over the
        # valid set (see docstring for the policy-aware alternative via the
        # inner policy's pass_min_stones)
        g = jax.random.gumbel(fb_key, valid[:, :-1].shape)
        fallback = jnp.argmax(
            jnp.where(valid[:, :-1], g, -jnp.inf), axis=1
        ).astype(jnp.int32)
        acts = jnp.where(
            is_pass & ~win_by_pass & board_any, fallback, acts
        )
        return acts

    return wrapped
