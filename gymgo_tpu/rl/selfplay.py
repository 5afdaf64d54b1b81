"""Batched on-device self-play: net-guided rollouts with lax.scan.

Produces AZ training tuples (canonical observation, visit/policy target,
outcome z from the mover's perspective) entirely on device — the trajectory
never touches the host.  Action selection masks invalid moves with the
env's own INVD channel, so generated games are always legal.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from gymgo_tpu.config import EnvConfig
from gymgo_tpu.core import actions as _actions
from gymgo_tpu.core import score as _score
from gymgo_tpu.core import state as _state
from gymgo_tpu.core import transform as _transform
from gymgo_tpu.env import batch_env as _batch_env


class SelfPlayBatch(NamedTuple):
    """Scanned self-play data (leading dims T, B)."""

    obs: jax.Array  # int8 (T, B, 6, N, N): canonical pre-move states
    policy_target: jax.Array  # f32 (T, B, N*N+1)
    value_target: jax.Array  # f32 (T, B): game outcome, mover's perspective
    mask: jax.Array  # bool (T, B): step was part of a live game


def policy_actions(key, states, apply_fn, params, temperature=1.0):
    """Sample actions from the net's masked policy over canonical states."""
    canonical = _transform.batch_canonical_form(states)
    logits, _ = apply_fn(params, canonical)
    valid = _actions.batch_valid_moves(states) > 0
    masked = jnp.where(valid, logits / jnp.maximum(temperature, 1e-6), -jnp.inf)
    return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32), masked


def selfplay_rollout(
    key: jax.Array,
    states: jax.Array,
    params,
    apply_fn,
    num_steps: int,
    config: EnvConfig,
    temperature: float = 1.0,
) -> tuple[jax.Array, SelfPlayBatch]:
    """Roll ``num_steps`` of net-guided self-play from ``states``.

    Value targets use the final winner sign of each env's state at scan end
    (exact for finished games; bootstrap-free approximation for truncated
    ones), flipped to each step's mover perspective.
    """

    def body(carry, _):
        st, k = carry
        k, sub = jax.random.split(k)
        acts, masked_logits = policy_actions(sub, st, apply_fn, params, temperature)
        canonical = _transform.batch_canonical_form(st)
        mover_is_white = _state.turn(st) == 1
        live = ~_state.game_ended(st)
        new_st, res = _batch_env.batch_step(st, acts, config)
        probs = jax.nn.softmax(masked_logits, axis=-1)
        return (new_st, k), (canonical, probs, mover_is_white, live)

    (final_states, _), (obs, probs, mover_white, live) = lax.scan(
        body, (states, key), None, length=num_steps
    )
    # Outcome from black's perspective, per env, then per-step mover flip.
    z_black = _score.winning(final_states, config.komi)  # f32 (B,)
    z = jnp.where(mover_white, -z_black[None, :], z_black[None, :])
    return final_states, SelfPlayBatch(
        obs=obs, policy_target=probs, value_target=z, mask=live
    )


def selfplay_search_rollout(
    key: jax.Array,
    states: jax.Array,
    params,
    apply_fn,
    num_steps: int,
    config: EnvConfig,
    num_sampled: int = 16,
    c_q: float = 1.0,
):
    """Self-play driven by the one-ply Gumbel lookahead (rl.search); policy
    targets are the search-improved distributions instead of the raw net
    policy — the AZ-style learning signal."""
    from gymgo_tpu.rl.search import gumbel_oneply

    def body(carry, _):
        st, k = carry
        k, sub = jax.random.split(k)
        res = gumbel_oneply(
            sub, st, params, apply_fn,
            num_sampled=num_sampled, c_q=c_q, komi=config.komi,
        )
        canonical = _transform.batch_canonical_form(st)
        mover_is_white = _state.turn(st) == 1
        live = ~_state.game_ended(st)
        new_st, _ = _batch_env.batch_step(st, res.actions, config)
        return (new_st, k), (canonical, res.improved_policy, mover_is_white, live)

    (final_states, _), (obs, probs, mover_white, live) = lax.scan(
        body, (states, key), None, length=num_steps
    )
    z_black = _score.winning(final_states, config.komi)
    z = jnp.where(mover_white, -z_black[None, :], z_black[None, :])
    return final_states, SelfPlayBatch(
        obs=obs, policy_target=probs, value_target=z, mask=live
    )


def augment_symmetries(key: jax.Array, obs: jax.Array, policy: jax.Array):
    """Apply a random dihedral symmetry per sample to (obs, policy) pairs —
    the training-data use of the reference's symmetry utilities
    (gogame.py:340-382), vectorized on device.

    obs: (M, 6, N, N); policy: (M, N*N + 1) with trailing pass logit/prob.
    """
    m = obs.shape[0]
    n = obs.shape[-1]
    orientations = jax.random.randint(key, (m,), 0, 8)

    def one(o, ob, pi):
        ob2 = _transform.apply_symmetry(ob, o)
        board = _transform.apply_symmetry(pi[: n * n].reshape(n, n), o)
        return ob2, jnp.concatenate([board.reshape(-1), pi[n * n:]])

    return jax.vmap(one)(orientations, obs, policy)


def selfplay_mcts_rollout(
    key: jax.Array,
    states: jax.Array,
    params,
    apply_fn,
    num_steps: int,
    config: EnvConfig,
    num_simulations: int = 32,
    tree_reuse=False,
    reuse_cap: int | None = None,
    **mcts_kw,
):
    """Full-AZ self-play: MCTS action selection with visit-count policy
    targets (rl.mcts).

    ``tree_reuse`` carries search effort across plies:
      * ``"root"`` (or ``True``) — the played root child's (visit, wsum)
        statistics (rl.mcts.played_child_stats);
      * ``"subtree"`` — the FULL played subtree (states, priors, stats,
        edges) via rl.mcts.compact_subtree, capped at ``reuse_cap`` nodes
        (default ``num_simulations``), so deep lines keep their entire
        search investment.
    Reuse is dropped for envs whose game ended (the next root is a
    fresh/terminal board).  Extra ``mcts_kw`` (e.g. ``num_parallel`` for
    virtual-loss waves) pass through to ``run_mcts``.
    """
    from gymgo_tpu.rl.mcts import (
        compact_subtree, empty_tree, played_child_stats, run_mcts,
    )

    mode = {False: "off", True: "root"}.get(tree_reuse, tree_reuse)
    if mode not in ("off", "root", "subtree"):
        raise ValueError(f"tree_reuse: {tree_reuse!r}")
    b = states.shape[0]
    a_size = config.board_size * config.board_size + 1
    r_cap = reuse_cap if reuse_cap is not None else num_simulations

    def body(carry, _):
        st, warm, k = carry
        k, sub = jax.random.split(k)
        warm_kw = (
            {"warm_root": warm} if mode == "root"
            else {"warm_tree": warm} if mode == "subtree"
            else {}
        )
        res, tree = run_mcts(
            sub, st, params, apply_fn,
            num_simulations=num_simulations, komi=config.komi,
            return_tree=True, **warm_kw, **mcts_kw,
        )
        canonical = _transform.batch_canonical_form(st)
        mover_is_white = _state.turn(st) == 1
        live = ~_state.game_ended(st)
        new_st, _ = _batch_env.batch_step(st, res.actions, config)
        if mode != "off":
            # Invalid when this root was already done (auto-reset means the
            # tree stepped a board the env replaced) or the game just ended.
            keep = live & ~_state.game_ended(new_st)
            if mode == "root":
                wv, ww = played_child_stats(tree, res.actions)
                k1 = keep[:, None]
                warm = (jnp.where(k1, wv, 0), jnp.where(k1, ww, 0.0))
            else:
                wt = compact_subtree(tree, res.actions, r_cap)
                cold = empty_tree(b, r_cap, a_size, st.shape[1:], st.dtype)
                warm = jax.tree.map(
                    lambda x, c: jnp.where(
                        keep.reshape((-1,) + (1,) * (x.ndim - 1)), x, c
                    ),
                    wt, cold,
                )
        return (new_st, warm, k), (
            canonical, res.visit_policy, mover_is_white, live,
        )

    if mode == "subtree":
        warm0 = empty_tree(b, r_cap, a_size, states.shape[1:], states.dtype)
    else:
        warm0 = (
            jnp.zeros((b, a_size), jnp.int32),
            jnp.zeros((b, a_size), jnp.float32),
        )
    (final_states, _, _), (obs, probs, mover_white, live) = lax.scan(
        body, (states, warm0, key), None, length=num_steps
    )
    z_black = _score.winning(final_states, config.komi)
    z = jnp.where(mover_white, -z_black[None, :], z_black[None, :])
    return final_states, SelfPlayBatch(
        obs=obs, policy_target=probs, value_target=z, mask=live
    )


def selfplay_gumbel_rollout(
    key: jax.Array,
    states: jax.Array,
    params,
    apply_fn,
    num_steps: int,
    config: EnvConfig,
    num_simulations: int = 32,
    max_considered: int = 16,
    **gumbel_kw,
):
    """Gumbel-AZ self-play: sequential-halving search actions with
    completed-Q improved-policy targets (rl.gumbel_mcts) — a valid policy
    improvement operator even at very small simulation budgets."""
    from gymgo_tpu.rl.gumbel_mcts import run_gumbel_mcts

    def body(carry, _):
        st, k = carry
        k, sub = jax.random.split(k)
        res = run_gumbel_mcts(
            sub, st, params, apply_fn,
            num_simulations=num_simulations, max_considered=max_considered,
            komi=config.komi, **gumbel_kw,
        )
        canonical = _transform.batch_canonical_form(st)
        mover_is_white = _state.turn(st) == 1
        live = ~_state.game_ended(st)
        new_st, _ = _batch_env.batch_step(st, res.actions, config)
        return (new_st, k), (canonical, res.improved_policy, mover_is_white, live)

    (final_states, _), (obs, probs, mover_white, live) = lax.scan(
        body, (states, key), None, length=num_steps
    )
    z_black = _score.winning(final_states, config.komi)
    z = jnp.where(mover_white, -z_black[None, :], z_black[None, :])
    return final_states, SelfPlayBatch(
        obs=obs, policy_target=probs, value_target=z, mask=live
    )
