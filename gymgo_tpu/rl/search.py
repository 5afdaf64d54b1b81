"""Batched one-ply lookahead action selection (Gumbel top-k + value net).

A jit-friendly policy-improvement operator in the spirit of Gumbel
AlphaZero's root action selection: sample k actions without replacement via
Gumbel top-k on the masked policy logits, expand each child with the exact
env step (the reference's ``children`` primitive, batched on device), score
children with the value head (negated: the child value is from the
opponent's perspective), and pick argmax of g + logits + c_q * q.

Everything is fixed-shape (B*k child evaluations per move) so it scans and
shards like the rest of the stack.  This is the search slice of the
framework; full multi-ply MCTS can build on the same pieces.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gymgo_tpu.core import actions as _actions
from gymgo_tpu.core import state as _state
from gymgo_tpu.core import step as _step
from gymgo_tpu.core import transform as _transform


class SearchResult(NamedTuple):
    actions: jax.Array  # int32 (B,): selected action per env
    sampled_actions: jax.Array  # int32 (B, K)
    q_values: jax.Array  # f32 (B, K): child values, mover's perspective
    improved_policy: jax.Array  # f32 (B, A): softmax(logits + c_q * q) target


def gumbel_oneply(
    key: jax.Array,
    states: jax.Array,
    params,
    apply_fn,
    num_sampled: int = 16,
    c_q: float = 1.0,
    komi: float = 0.0,
    pass_min_stones: int = 0,
) -> SearchResult:
    """Select actions by one-ply value lookahead over Gumbel-sampled moves.

    ``pass_min_stones`` > 0 applies the self-play opening constraint to the
    root action set (actions.mask_early_pass)."""
    b = states.shape[0]
    n = states.shape[-1]
    a_size = n * n + 1
    k = min(num_sampled, a_size)

    canonical = _transform.batch_canonical_form(states)
    logits, _ = apply_fn(params, canonical)
    valid = _actions.batch_valid_moves(states) > 0
    valid = _actions.mask_early_pass(valid, states, pass_min_stones)
    masked = jnp.where(valid, logits, -jnp.inf)

    g = jax.random.gumbel(key, (b, a_size))
    scores = jnp.where(valid, masked + g, -jnp.inf)
    _, top_actions = jax.lax.top_k(scores, k)  # (B, K), all valid (pass is)

    # Expand children: (B*K) exact env steps.
    tiled = jnp.repeat(states, k, axis=0)
    flat_actions = top_actions.reshape(-1)
    children, info = _step.step_states(tiled, flat_actions)

    # Child value from the mover's perspective = -V(child for next player).
    child_canonical = _transform.batch_canonical_form(children)
    _, child_values = apply_fn(params, child_canonical)
    q = -child_values.reshape(b, k)
    # Terminal children: use the exact outcome sign instead of the net.
    child_done = _state.game_ended(children).reshape(b, k)
    mover_is_white = _state.turn(states) == 1

    q = jnp.where(
        child_done, _terminal_q(children, b, k, mover_is_white, komi), q
    )

    gathered_logits = jnp.take_along_axis(masked, top_actions, axis=1)
    gathered_g = jnp.take_along_axis(g, top_actions, axis=1)
    pick = jnp.argmax(gathered_g + gathered_logits + c_q * q, axis=1)
    actions = jnp.take_along_axis(top_actions, pick[:, None], axis=1)[:, 0]

    # Improved policy target over the full action space: logits + c_q * q at
    # sampled actions, untouched logits elsewhere, softmaxed over valid.
    improved_logits = masked.at[
        jnp.arange(b)[:, None], top_actions
    ].add(c_q * q)
    improved = jax.nn.softmax(
        jnp.where(valid, improved_logits, -jnp.inf), axis=-1
    )
    return SearchResult(
        actions=actions.astype(jnp.int32),
        sampled_actions=top_actions.astype(jnp.int32),
        q_values=q,
        improved_policy=improved,
    )


def _terminal_q(children, b, k, mover_is_white, komi):
    from gymgo_tpu.core import score as _score

    sign_black = _score.winning(children, komi).reshape(b, k)
    return jnp.where(mover_is_white[:, None], -sign_black, sign_black)


def make_search_policy(params, apply_fn, num_sampled=16, c_q=1.0, komi=0.0,
                       pass_min_stones: int = 0):
    """Adapter: a ``policy_fn(key, states) -> actions`` for batch_env.rollout."""

    def policy_fn(key, states):
        return gumbel_oneply(
            key, states, params, apply_fn,
            num_sampled=num_sampled, c_q=c_q, komi=komi,
            pass_min_stones=pass_min_stones,
        ).actions

    return policy_fn
