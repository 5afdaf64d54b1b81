"""Batched Gumbel MCTS with sequential halving (planning à la Gumbel AZ).

Policy-improvement search that is provably an improvement operator even at
tiny simulation budgets (Danihelka et al., "Policy improvement by planning
with Gumbel", 2022): sample ``max_considered`` root actions without
replacement via Gumbel-top-k, spread the simulation budget over them with
sequential halving (scores g + logits + sigma(q)), and descend interior
nodes with the deterministic completed-Q rule.  The returned
``improved_policy`` = softmax(logits + sigma(completedQ)) is the AZ training
target; ``actions`` is the halving winner (no sampling noise beyond the
root Gumbels).

Everything is fixed-shape and jittable: the halving schedule is a static
per-simulation "considered count" table; candidate choice per simulation is
"min visit count among the top-`considered` by score".  Like rl/mcts.py the
simulator is the exact env kernel (one ``step_states`` per simulation), the
whole search vmaps over the env batch, and zero host round-trips occur.

Reference for the environment semantics being searched: the one-ply
expansion contract of /root/reference/gym_go/gogame.py:175-186 generalized
to multi-ply lookahead (the reference itself ships no search).
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# Tree-table packing experiments for the measured B=512->1024 throughput
# cliff (BENCHMARKS.md round-3 sweep: 2.87x time for 2x batch — the
# (B, nodes, A) working set, ~50MB/array at B=1024 f32/i32, outgrows what
# XLA can keep resident).  Comma-separated tokens in GYMGO_GUMBEL_PACK:
#   i16  — visit counts as int16 (sims <= 32767; halves the visit array)
#   bf16 — wsum (and the stored log-prior under ``logp``) as bfloat16;
#          q is computed in f32, only STORAGE narrows (backup accumulation
#          rounds to bf16 — not bit-exact with the default)
#   logp — store log-softmax priors + a bool validity plane instead of
#          softmax priors: removes the per-simulation log over the whole
#          (B, nodes, A) prior array from interior_scores
# Default (unset) keeps the exact f32/int32 layout.
_PACK = frozenset(
    t for t in os.environ.get("GYMGO_GUMBEL_PACK", "").split(",") if t
)
_VISIT_DT = jnp.int16 if "i16" in _PACK else jnp.int32
_WSUM_DT = jnp.bfloat16 if "bf16" in _PACK else jnp.float32
_USE_LOGP = "logp" in _PACK

from gymgo_tpu.core import actions as _actions
from gymgo_tpu.core import state as _state
from gymgo_tpu.core import step as _step
from gymgo_tpu.core import transform as _transform
from gymgo_tpu.rl import treewalk as _treewalk


class GumbelMCTSResult(NamedTuple):
    actions: jax.Array  # int32 (B,): sequential-halving winner
    improved_policy: jax.Array  # f32 (B, A): softmax(logits + sigma(cQ))
    root_value: jax.Array  # f32 (B,): completed-Q root estimate
    root_visits: jax.Array  # int32 (B, A)
    sampled_actions: jax.Array  # int32 (B, M): Gumbel-top-k candidates


def seq_halving_schedule(num_simulations: int, max_considered: int) -> tuple:
    """Static per-simulation considered-count table.

    Phase p keeps ``m / 2^p`` candidates and gives each
    ``max(1, n // (ceil(log2 m) * considered))`` visits; once one candidate
    remains, the tail of the budget keeps refining it.
    """
    n, m = num_simulations, max(2, max_considered)
    log2m = max(1, math.ceil(math.log2(m)))
    out: list[int] = []
    considered = m
    while len(out) < n:
        if considered > 1:
            per_candidate = max(1, n // (log2m * considered))
            block = per_candidate * considered
        else:
            block = n - len(out)
        out.extend([considered] * min(block, n - len(out)))
        considered = max(1, considered // 2)
    return tuple(out)


def _sigma(q, max_visit, c_visit: float, c_scale: float):
    """Monotone value->logit transform: (c_visit + maxN) * c_scale * q."""
    return (c_visit + max_visit.astype(jnp.float32)) * c_scale * q


def run_gumbel_mcts(
    key: jax.Array,
    states: jax.Array,
    params,
    apply_fn,
    num_simulations: int = 32,
    max_considered: int = 16,
    c_visit: float = 50.0,
    c_scale: float = 1.0,
    komi: float = 0.0,
    pass_min_stones: int = 0,
) -> GumbelMCTSResult:
    """Run Gumbel MCTS from each state.  ``apply_fn(params, canonical) ->
    (logits, value)`` with value from the canonical mover's perspective.

    ``pass_min_stones`` > 0 applies the self-play opening constraint
    (actions.mask_early_pass) to the ROOT action set only — interior nodes
    search the full rules."""
    b = states.shape[0]
    n = states.shape[-1]
    a_size = n * n + 1
    m = min(max_considered, a_size)
    num_nodes = num_simulations + 1
    max_depth = num_simulations + 1
    schedule = jnp.asarray(
        seq_halving_schedule(num_simulations, m), jnp.int32
    )

    def masked_policy(sts):
        logits, value = apply_fn(params, _transform.batch_canonical_form(sts))
        valid = _actions.batch_valid_moves(sts) > 0
        masked = jnp.where(valid, logits, -jnp.inf)
        return masked, value, valid

    root_logits, root_value_net, valid_root = masked_policy(states)
    valid_root = _actions.mask_early_pass(valid_root, states, pass_min_stones)
    root_logits = jnp.where(valid_root, root_logits, -jnp.inf)
    g = jax.random.gumbel(key, (b, a_size))
    # Gumbel-top-m without replacement over valid actions.
    _, cand = lax.top_k(jnp.where(valid_root, root_logits + g, -jnp.inf), m)
    cand = cand.astype(jnp.int32)  # (B, M)
    # one-hot candidate masks, reused every simulation for gather-free root
    # stats (TPU gathers at (B, A) scale cost ~70us; the (B, M, A) masked
    # reduces below are cheap VPU passes).
    cand_onehot = cand[..., None] == jnp.arange(a_size, dtype=jnp.int32)
    cand_valid = jnp.any(cand_onehot & valid_root[:, None, :], axis=-1)  # (B, M)
    cand_base = jnp.sum(
        jnp.where(cand_onehot, (root_logits + g)[:, None, :], 0.0), axis=-1
    )
    cand_base = jnp.where(cand_valid, cand_base, -jnp.inf)

    # Tree arrays (node 0 = root; simulation i expands slot i+1).  Values
    # are stored from the *node mover's* perspective throughout.
    node_states = jnp.zeros((b, num_nodes) + states.shape[1:], states.dtype)
    node_states = node_states.at[:, 0].set(states)
    node_done = jnp.zeros((b, num_nodes), bool)
    node_done = node_done.at[:, 0].set(_state.game_ended(states))
    node_value = jnp.zeros((b, num_nodes), jnp.float32)
    node_value = node_value.at[:, 0].set(root_value_net)
    if _USE_LOGP:
        # log-prior storage: the per-sim log over (B, nodes, A) disappears
        # from interior_scores; validity rides a separate bool plane
        prior = jnp.full((b, num_nodes, a_size), -jnp.inf, _WSUM_DT)
        prior = prior.at[:, 0].set(
            jax.nn.log_softmax(root_logits, axis=-1).astype(_WSUM_DT)
        )
        node_valid = jnp.zeros((b, num_nodes, a_size), bool)
        node_valid = node_valid.at[:, 0].set(valid_root)
    else:
        prior = jnp.zeros((b, num_nodes, a_size), jnp.float32)
        prior = prior.at[:, 0].set(
            jax.nn.softmax(root_logits, axis=-1)
        )
        node_valid = None
    visit = jnp.zeros((b, num_nodes, a_size), _VISIT_DT)
    wsum = jnp.zeros((b, num_nodes, a_size), _WSUM_DT)
    child = jnp.full((b, num_nodes, a_size), -1, jnp.int32)

    bidx = jnp.arange(b)

    def root_candidate_stats(visit, wsum):
        """Per-candidate (N, q) at the root; q from the root mover's view.
        Gather-free: masked reduces through the precomputed candidate
        one-hots instead of per-sim take_along_axis."""
        v0 = visit[:, 0].astype(jnp.int32)
        w0 = wsum[:, 0].astype(jnp.float32)
        cn = jnp.sum(jnp.where(cand_onehot, v0[:, None, :], 0), axis=-1)
        cw = jnp.sum(jnp.where(cand_onehot, w0[:, None, :], 0.0), axis=-1)
        q = jnp.where(cn > 0, cw / jnp.maximum(cn, 1), 0.0)
        return cn, q

    def interior_scores(p_prior, p_visit, p_wsum, p_value, p_valid):
        """Deterministic non-root selection: argmax pi'(a) - N(a)/(1+sumN),
        computed elementwise for ALL (B, M) nodes at once (gather-free —
        tree stats are frozen during one selection walk, see rl/treewalk).

        completedQ(a) = q(a) when visited else the node's own net value
        (both from the node mover's perspective)."""
        total = jnp.sum(p_visit.astype(jnp.int32), axis=-1, keepdims=True)
        q = jnp.where(
            p_visit > 0,
            p_wsum.astype(jnp.float32)
            / jnp.maximum(p_visit, 1).astype(jnp.float32),
            p_value[..., None],
        )
        if _USE_LOGP:
            logits_pi = p_prior.astype(jnp.float32)
            selectable = p_valid
        else:
            logits_pi = jnp.log(jnp.maximum(p_prior, 1e-30))
            selectable = p_prior > 0
        max_n = jnp.max(p_visit.astype(jnp.int32), axis=-1, keepdims=True)
        improved = jax.nn.softmax(
            logits_pi + _sigma(q, max_n, c_visit, c_scale), axis=-1
        )
        scores = improved - p_visit.astype(jnp.float32) / (1.0 + total)
        return jnp.where(selectable, scores, -jnp.inf)

    def simulate(sim, tree):
        (node_states, node_done, node_value, prior, visit, wsum, child,
         node_valid) = tree

        # ---- root action by sequential halving: among the top-`considered`
        # candidates by g + logits + sigma(q), visit the least-visited.
        considered = schedule[sim]
        cn, cq = root_candidate_stats(visit, wsum)
        max_n = jnp.max(visit[:, 0], axis=1)  # (B,)
        score = cand_base + _sigma(cq, max_n[:, None], c_visit, c_scale)
        score = jnp.where(cand_valid, score, -jnp.inf)
        # rank of each candidate by score (0 = best): a candidate is "in
        # contention" iff rank < considered.
        order = jnp.argsort(-score, axis=1)
        rank = jnp.zeros((b, m), jnp.int32).at[
            bidx[:, None], order
        ].set(jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (b, m)))
        in_play = (rank < considered) & cand_valid
        # lexicographic (visits, rank) argmin; out-of-play slots pushed past
        # any reachable visit count (<= num_simulations < 2^20)
        pick_key = jnp.where(in_play, cn, jnp.int32(1 << 20)) * m + rank
        root_slot = jnp.argmin(pick_key, axis=1).astype(jnp.int32)  # (B,)
        root_action = jnp.take_along_axis(cand, root_slot[:, None], axis=1)[:, 0]

        # ---- selection walk: depth 0 edge forced to root_action, interior
        # edges by the deterministic rule; stop at an unexpanded edge or a
        # terminal child.  The per-node argmax/next/continue tables are
        # precomputed gather-free (stats frozen during one walk), and the
        # descent itself only touches (B, M) tables — see rl/treewalk.
        scores = interior_scores(prior, visit, wsum, node_value, node_valid)
        tables = _treewalk.node_tables(scores, child, node_done)
        f_nxt, f_keep = _treewalk.forced_root_edge(root_action, child, node_done)
        sel_depth, path_n, path_a = _treewalk.walk_paths(
            *tables, max_depth, forced_root=(root_action, f_nxt, f_keep)
        )
        last = jnp.maximum(sel_depth - 1, 0)
        exp_parent = jnp.take_along_axis(path_n, last[:, None], axis=1)[:, 0]
        exp_action = jnp.take_along_axis(path_a, last[:, None], axis=1)[:, 0]
        prev_child = _treewalk.gather_edge(child, exp_parent, exp_action)
        already = prev_child >= 0

        # ---- expansion: one exact env step per env.  The terminal outcome
        # rides the step's own fused area flood (StepInfo.black/white_area)
        # instead of a second _score.winning flood per simulation.
        parent_states = node_states[bidx, exp_parent]
        new_states, step_info = _step.step_states(parent_states, exp_action)
        slot = jnp.int32(sim + 1)
        new_logits, new_values, new_valid = masked_policy(new_states)
        new_done = _state.game_ended(new_states)
        win_black = jnp.sign(
            step_info.black_area.astype(jnp.float32)
            - step_info.white_area.astype(jnp.float32)
            - komi
        )
        outcome = jnp.where(_state.turn(new_states) == 1, -win_black, win_black)
        leaf_value = jnp.where(new_done, outcome, new_values)

        write = ~already
        node_states = node_states.at[bidx, slot].set(
            jnp.where(write[:, None, None, None], new_states, node_states[:, slot])
        )
        node_done = node_done.at[:, slot].set(
            jnp.where(write, new_done, node_done[:, slot])
        )
        node_value = node_value.at[:, slot].set(
            jnp.where(write, leaf_value, node_value[:, slot])
        )
        if _USE_LOGP:
            logp_new = jax.nn.log_softmax(new_logits, axis=-1).astype(
                prior.dtype)
            prior = prior.at[bidx, slot].set(
                jnp.where(write[:, None], logp_new, prior[:, slot])
            )
            node_valid = node_valid.at[bidx, slot].set(
                jnp.where(write[:, None], new_valid, node_valid[:, slot])
            )
        else:
            prior = prior.at[bidx, slot].set(
                jnp.where(
                    write[:, None], jax.nn.softmax(new_logits, axis=-1),
                    prior[:, slot],
                )
            )
        child = child.at[bidx, exp_parent, exp_action].set(
            jnp.where(write, slot, prev_child)
        )
        # Terminal-child revisit: back up its exact outcome again.  A
        # revisited child is terminal, so its stored node_value IS its
        # outcome from its own mover's perspective (set at creation) — no
        # state gather, no re-scoring flood.
        revisit_value = _treewalk.gather_node(
            node_value, jnp.maximum(prev_child, 0)
        )
        leaf_value = jnp.where(already, revisit_value, leaf_value)

        # ---- backup along the path with per-ply sign flips: ONE batched
        # scatter-add per array ((node, act) pairs on a path are distinct —
        # strict descent — so this is bit-identical to the sequential loop).
        def backup_one(p_visit, p_wsum, path_n, path_a, depth, v_leaf):
            d = jnp.arange(max_depth)
            on_path = d < depth
            nodes = jnp.where(on_path, path_n, 0)
            acts = jnp.where(on_path, path_a, 0)
            steps_up = depth - 1 - d
            sign = jnp.where(steps_up % 2 == 0, -1.0, 1.0)
            pv = p_visit.at[nodes, acts].add(on_path.astype(p_visit.dtype))
            pw = p_wsum.at[nodes, acts].add(
                jnp.where(on_path, sign * v_leaf, 0.0).astype(p_wsum.dtype)
            )
            return pv, pw

        visit, wsum = jax.vmap(backup_one)(
            visit, wsum, path_n, path_a, sel_depth, leaf_value
        )
        return (node_states, node_done, node_value, prior, visit, wsum,
                child, node_valid)

    tree = (node_states, node_done, node_value, prior, visit, wsum, child,
            node_valid)
    tree = lax.fori_loop(0, num_simulations, simulate, tree)
    (node_states, node_done, node_value, prior, visit, wsum, child,
     node_valid) = tree

    # ---- outputs.
    cn, cq = root_candidate_stats(visit, wsum)
    max_n = jnp.max(visit[:, 0], axis=1)
    final_score = cand_base + _sigma(cq, max_n[:, None], c_visit, c_scale)
    final_score = jnp.where(cand_valid & (cn > 0), final_score, -jnp.inf)
    win_slot = jnp.argmax(final_score, axis=1)
    actions = jnp.take_along_axis(cand, win_slot[:, None], axis=1)[:, 0]

    # Improved policy over the FULL action space: completedQ(a) = q(a) for
    # visited root actions, root net value otherwise.
    rn = visit[:, 0].astype(jnp.int32)
    rq = jnp.where(
        rn > 0,
        wsum[:, 0].astype(jnp.float32) / jnp.maximum(rn, 1),
        root_value_net[:, None],
    )
    improved_logits = root_logits + _sigma(rq, max_n[:, None], c_visit, c_scale)
    improved = jax.nn.softmax(
        jnp.where(valid_root, improved_logits, -jnp.inf), axis=-1
    )
    # Root value estimate: visit-weighted mean of completed Q (falls back to
    # the net value with zero visits).
    total_n = jnp.sum(rn, axis=1)
    root_q = jnp.where(
        total_n > 0,
        jnp.sum(wsum[:, 0].astype(jnp.float32), axis=1)
        / jnp.maximum(total_n, 1),
        root_value_net,
    )
    return GumbelMCTSResult(
        actions=actions.astype(jnp.int32),
        improved_policy=improved,
        root_value=root_q,
        root_visits=rn,
        sampled_actions=cand,
    )


def make_gumbel_mcts_policy(
    params, apply_fn, num_simulations=32, max_considered=16, **kw
):
    """Adapter: ``policy_fn(key, states) -> actions`` for batch_env.rollout."""

    def policy_fn(key, states):
        return run_gumbel_mcts(
            key, states, params, apply_fn,
            num_simulations=num_simulations, max_considered=max_considered, **kw
        ).actions

    return policy_fn
