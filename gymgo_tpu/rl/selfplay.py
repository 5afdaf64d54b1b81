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
    mover_white: jax.Array | None = None  # bool (T, B): white made this move
    done: jax.Array | None = None  # bool (T, B): game ended AT this step
    grounded: jax.Array | None = None  # bool (T, B): this row's game ENDS
    # inside the window, i.e. its value target is a real terminal outcome
    # (the complement is the truncated tail: area-sign noise or a bootstrap)


def per_game_value_targets(done, sign, final_states, mover_white, komi,
                           z_final=None):
    """Per-step game outcomes across auto-reset game boundaries.

    With ``auto_reset`` one scan window spans several games per env; the
    naive choice (the window-final winner for every step) assigns earlier
    games the outcome of a LATER, unrelated game — measured to destroy
    value learning.  Here each step's target is the outcome of its OWN
    game: a reverse scan backward-fills the terminal sign recorded at each
    game's ending step; steps of the window's truncated last game fall
    back to ``z_final`` — by default the current winner sign of the final
    state (bootstrap-free approximation).

    Callers may pass ``z_final`` (B,) from BLACK's perspective to use a
    better truncation estimate: ``net_value_black`` gives a value-head
    estimate (a TD-style bootstrap).  At small boards windows cover whole
    games and this barely matters; at 13x13/19x19 a window is a fraction of
    one game, and the area-sign of a HALF-PLAYED board is mostly stone-count
    noise — the bootstrap replaces that with the trained estimator.

    SOUNDNESS: the bootstrap MUST come from a FROZEN target network, not
    the online params.  With the online net, when most windows contain no
    game end the target is self-referential and the constant-zero value
    function is a fixed point of the update — a measured 13x13 resume
    collapsed exactly that way (v-loss 0.45 -> 0.0008, BENCHMARKS.md).
    The ``selfplay_*_rollout(value_bootstrap=True, target_params=...)``
    plumbing and train.py's ``--value-bootstrap`` (periodic hard copy
    every ``--target-update`` iters) implement the frozen-target form;
    passing ``value_bootstrap=True`` without ``target_params`` reproduces
    the measured-harmful online form and is for experiments only.

    done, sign: (T, B) post-step done flags and terminal outcome signs
    from black's perspective (read where done).  Returns (T, B) value
    targets from each step's mover's perspective.
    """
    if z_final is None:
        z_final = _score.winning(final_states, komi)

    def back(carry, ds):
        d, s = ds
        z = jnp.where(d, s, carry)
        return z, z

    _, z_black = lax.scan(back, z_final, (done, sign), reverse=True)
    return jnp.where(mover_white, -z_black, z_black)


def net_value_black(final_states, params, apply_fn):
    """The net's value of ``final_states`` from BLACK's perspective, for
    use as the truncated-game estimate in ``per_game_value_targets``.
    ``apply_fn(params, canonical) -> (logits, value)`` with value from the
    canonical mover's perspective."""
    _, v = apply_fn(params, _transform.batch_canonical_form(final_states))
    return jnp.where(_state.turn(final_states) == 1, -v, v)


def _reset_done(st, config):
    """Pre-reset finished envs at the top of a self-play scan body.

    ``batch_step`` auto-resets done envs internally, but only AFTER the
    action was chosen — so the action for a boundary step was selected on
    the stone-rich TERMINAL board (where e.g. the early-pass constraint
    allows pass) and then applied to the fresh empty board.  Resetting
    before action selection makes boundary rows real opening moves: the
    policy sees the board the action will actually land on, and no
    mismatched obs/target rows are generated at all."""
    if not config.auto_reset:
        return st
    done = _state.game_ended(st)
    return jnp.where(done[:, None, None, None], jnp.zeros_like(st), st)


def _outcome_sign(res, komi):
    """Terminal outcome sign from black's perspective, from the step's own
    fused Trump-Taylor areas (meaningful where ``res.done``)."""
    return jnp.sign(
        res.black_area.astype(jnp.float32)
        - res.white_area.astype(jnp.float32)
        - komi
    )


def policy_actions(key, states, apply_fn, params, temperature=1.0,
                   pass_min_stones: int = 0):
    """Sample actions from the net's masked policy over canonical states.

    ``pass_min_stones`` > 0 applies the self-play opening constraint
    (actions.mask_early_pass)."""
    canonical = _transform.batch_canonical_form(states)
    logits, _ = apply_fn(params, canonical)
    valid = _actions.batch_valid_moves(states) > 0
    valid = _actions.mask_early_pass(valid, states, pass_min_stones)
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
    pass_min_stones: int = 0,
    value_bootstrap: bool = False,
    target_params=None,
) -> tuple[jax.Array, SelfPlayBatch]:
    """Roll ``num_steps`` of net-guided self-play from ``states``.

    Value targets are each step's OWN game outcome (auto-reset boundaries
    respected, see ``per_game_value_targets``), flipped to the mover's
    perspective.

    NOTE: the policy target here is the net's own masked softmax — there is
    no policy-improvement operator in this mode, and trained nets collapse
    toward always-pass (the one action whose target mass is never zeroed by
    the validity mask).  Use ``selfplay_search_rollout`` (or the MCTS/Gumbel
    rollouts) for actual AZ learning; this mode exists as the cheap
    data-generation baseline.
    """

    def body(carry, _):
        st, k = carry
        st = _reset_done(st, config)
        k, sub = jax.random.split(k)
        acts, masked_logits = policy_actions(
            sub, st, apply_fn, params, temperature, pass_min_stones
        )
        canonical = _transform.batch_canonical_form(st)
        mover_is_white = _state.turn(st) == 1
        live = ~_state.game_ended(st)
        new_st, res = _batch_env.batch_step(st, acts, config)
        probs = jax.nn.softmax(masked_logits, axis=-1)
        return (new_st, k), (
            canonical, probs, mover_is_white, live,
            res.done, _outcome_sign(res, config.komi),
        )

    (final_states, _), (obs, probs, mover_white, live, done, sign) = lax.scan(
        body, (states, key), None, length=num_steps
    )
    zf = (net_value_black(
              final_states,
              params if target_params is None else target_params,
              apply_fn)
          if value_bootstrap else None)
    z = per_game_value_targets(done, sign, final_states, mover_white,
                               config.komi, z_final=zf)
    grounded = jnp.flip(
        jnp.cumsum(jnp.flip(done.astype(jnp.int32), 0), 0), 0) > 0
    return final_states, SelfPlayBatch(
        obs=obs, policy_target=probs, value_target=z, mask=live,
        mover_white=mover_white, done=done, grounded=grounded,
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
    pass_min_stones: int = 0,
    value_bootstrap: bool = False,
    target_params=None,
):
    """Self-play driven by the one-ply Gumbel lookahead (rl.search); policy
    targets are the search-improved distributions instead of the raw net
    policy — the AZ-style learning signal."""
    from gymgo_tpu.rl.search import gumbel_oneply

    def body(carry, _):
        st, k = carry
        st = _reset_done(st, config)
        k, sub = jax.random.split(k)
        res = gumbel_oneply(
            sub, st, params, apply_fn,
            num_sampled=num_sampled, c_q=c_q, komi=config.komi,
            pass_min_stones=pass_min_stones,
        )
        canonical = _transform.batch_canonical_form(st)
        mover_is_white = _state.turn(st) == 1
        live = ~_state.game_ended(st)
        new_st, step_res = _batch_env.batch_step(st, res.actions, config)
        return (new_st, k), (
            canonical, res.improved_policy, mover_is_white, live,
            step_res.done, _outcome_sign(step_res, config.komi),
        )

    (final_states, _), (obs, probs, mover_white, live, done, sign) = lax.scan(
        body, (states, key), None, length=num_steps
    )
    zf = (net_value_black(
              final_states,
              params if target_params is None else target_params,
              apply_fn)
          if value_bootstrap else None)
    z = per_game_value_targets(done, sign, final_states, mover_white,
                               config.komi, z_final=zf)
    grounded = jnp.flip(
        jnp.cumsum(jnp.flip(done.astype(jnp.int32), 0), 0), 0) > 0
    return final_states, SelfPlayBatch(
        obs=obs, policy_target=probs, value_target=z, mask=live,
        mover_white=mover_white, done=done, grounded=grounded,
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
    pass_min_stones: int = 0,
    value_bootstrap: bool = False,
    target_params=None,
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
        st = _reset_done(st, config)
        k, sub = jax.random.split(k)
        warm_kw = (
            {"warm_root": warm} if mode == "root"
            else {"warm_tree": warm} if mode == "subtree"
            else {}
        )
        res, tree = run_mcts(
            sub, st, params, apply_fn,
            num_simulations=num_simulations, komi=config.komi,
            return_tree=True, pass_min_stones=pass_min_stones,
            **warm_kw, **mcts_kw,
        )
        canonical = _transform.batch_canonical_form(st)
        mover_is_white = _state.turn(st) == 1
        live = ~_state.game_ended(st)
        new_st, step_res = _batch_env.batch_step(st, res.actions, config)
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
            step_res.done, _outcome_sign(step_res, config.komi),
        )

    if mode == "subtree":
        warm0 = empty_tree(b, r_cap, a_size, states.shape[1:], states.dtype)
    else:
        warm0 = (
            jnp.zeros((b, a_size), jnp.int32),
            jnp.zeros((b, a_size), jnp.float32),
        )
    (final_states, _, _), (obs, probs, mover_white, live, done, sign) = lax.scan(
        body, (states, warm0, key), None, length=num_steps
    )
    zf = (net_value_black(
              final_states,
              params if target_params is None else target_params,
              apply_fn)
          if value_bootstrap else None)
    z = per_game_value_targets(done, sign, final_states, mover_white,
                               config.komi, z_final=zf)
    grounded = jnp.flip(
        jnp.cumsum(jnp.flip(done.astype(jnp.int32), 0), 0), 0) > 0
    return final_states, SelfPlayBatch(
        obs=obs, policy_target=probs, value_target=z, mask=live,
        mover_white=mover_white, done=done, grounded=grounded,
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
    pass_min_stones: int = 0,
    value_bootstrap: bool = False,
    target_params=None,
    **gumbel_kw,
):
    """Gumbel-AZ self-play: sequential-halving search actions with
    completed-Q improved-policy targets (rl.gumbel_mcts) — a valid policy
    improvement operator even at very small simulation budgets."""
    from gymgo_tpu.rl.gumbel_mcts import run_gumbel_mcts

    def body(carry, _):
        st, k = carry
        st = _reset_done(st, config)
        k, sub = jax.random.split(k)
        res = run_gumbel_mcts(
            sub, st, params, apply_fn,
            num_simulations=num_simulations, max_considered=max_considered,
            komi=config.komi, pass_min_stones=pass_min_stones, **gumbel_kw,
        )
        canonical = _transform.batch_canonical_form(st)
        mover_is_white = _state.turn(st) == 1
        live = ~_state.game_ended(st)
        new_st, step_res = _batch_env.batch_step(st, res.actions, config)
        return (new_st, k), (
            canonical, res.improved_policy, mover_is_white, live,
            step_res.done, _outcome_sign(step_res, config.komi),
        )

    (final_states, _), (obs, probs, mover_white, live, done, sign) = lax.scan(
        body, (states, key), None, length=num_steps
    )
    zf = (net_value_black(
              final_states,
              params if target_params is None else target_params,
              apply_fn)
          if value_bootstrap else None)
    z = per_game_value_targets(done, sign, final_states, mover_white,
                               config.komi, z_final=zf)
    grounded = jnp.flip(
        jnp.cumsum(jnp.flip(done.astype(jnp.int32), 0), 0), 0) > 0
    return final_states, SelfPlayBatch(
        obs=obs, policy_target=probs, value_target=z, mask=live,
        mover_white=mover_white, done=done, grounded=grounded,
    )
