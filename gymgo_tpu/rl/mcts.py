"""Batched on-device MCTS with exact environment dynamics (PUCT).

Unlike model-based trees (MuZero), the simulator *is* the device kernel, so
tree nodes store real board states and expansion is one exact ``step_states``
call.  The whole search is one jitted program: fixed ``num_simulations``
iterations of select -> expand -> evaluate -> backup over array-encoded
trees, vmapped across the env batch.  Zero host round-trips; scans and
shards like everything else.

Tree encoding (per env): node 0 is the root; simulation i expands into node
slot i+1.  Per-(node, action) statistics N/W/P drive PUCT selection; values
are always stored from the *node mover's* perspective and sign-flipped while
backing up the path.

Search output: visit-count policy over root actions (the AZ training
target) and the root value estimate.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from gymgo_tpu.core import actions as _actions
from gymgo_tpu.core import score as _score
from gymgo_tpu.core import state as _state
from gymgo_tpu.core import step as _step
from gymgo_tpu.core import transform as _transform


class MCTSResult(NamedTuple):
    actions: jax.Array  # int32 (B,): sampled from the visit policy
    visit_policy: jax.Array  # f32 (B, A): normalized root visit counts
    root_value: jax.Array  # f32 (B,): mean root action value
    root_visits: jax.Array  # int32 (B, A)


def _puct_scores(prior, visit, value_sum, c_puct):
    q = jnp.where(visit > 0, value_sum / jnp.maximum(visit, 1), 0.0)
    total = jnp.sum(visit, axis=-1, keepdims=True)
    u = c_puct * prior * jnp.sqrt(total.astype(jnp.float32) + 1.0) / (
        1.0 + visit.astype(jnp.float32)
    )
    return q + u


def run_mcts(
    key: jax.Array,
    states: jax.Array,
    params,
    apply_fn,
    num_simulations: int = 32,
    c_puct: float = 1.5,
    komi: float = 0.0,
    dirichlet_alpha: float = 0.3,
    dirichlet_fraction: float = 0.25,
    temperature: float = 1.0,
) -> MCTSResult:
    """Run PUCT search from each state in the batch.  ``apply_fn(params, s)
    -> (logits, value)`` with value from the canonical mover's perspective."""
    b = states.shape[0]
    n = states.shape[-1]
    a_size = n * n + 1
    m = num_simulations + 1  # node slots
    max_depth = num_simulations + 1

    def masked_policy(sts):
        logits, value = apply_fn(params, _transform.batch_canonical_form(sts))
        valid = _actions.batch_valid_moves(sts) > 0
        probs = jax.nn.softmax(jnp.where(valid, logits, -jnp.inf), axis=-1)
        return probs, value

    root_prior, root_value = masked_policy(states)
    noise_key, pick_key = jax.random.split(key)
    noise = jax.random.dirichlet(
        noise_key, jnp.full((a_size,), dirichlet_alpha), (b,)
    )
    valid_root = _actions.batch_valid_moves(states) > 0
    noisy = root_prior * (1 - dirichlet_fraction) + noise * dirichlet_fraction
    noisy = jnp.where(valid_root, noisy, 0.0)
    root_prior = noisy / jnp.sum(noisy, axis=-1, keepdims=True)

    # Tree arrays.
    node_states = jnp.zeros((b, m) + states.shape[1:], states.dtype)
    node_states = node_states.at[:, 0].set(states)
    node_done = jnp.zeros((b, m), bool)
    node_done = node_done.at[:, 0].set(_state.game_ended(states))
    prior = jnp.zeros((b, m, a_size), jnp.float32).at[:, 0].set(root_prior)
    visit = jnp.zeros((b, m, a_size), jnp.int32)
    wsum = jnp.zeros((b, m, a_size), jnp.float32)
    child = jnp.full((b, m, a_size), -1, jnp.int32)

    def simulate(sim, tree):
        node_states, node_done, prior, visit, wsum, child = tree

        # ---- selection (per env): walk PUCT argmax edges until an
        # unexpanded child or a terminal node; record the path.
        def select_one(p_node, p_prior, p_visit, p_wsum, p_child, p_done):
            def cond(c):
                node, depth, path_n, path_a, leaf_edge_open = c
                return leaf_edge_open & (depth < max_depth)

            def body(c):
                node, depth, path_n, path_a, _ = c
                scores = _puct_scores(
                    p_prior[node], p_visit[node], p_wsum[node], c_puct
                )
                scores = jnp.where(p_prior[node] > 0, scores, -jnp.inf)
                act = jnp.argmax(scores).astype(jnp.int32)
                path_n = path_n.at[depth].set(node)
                path_a = path_a.at[depth].set(act)
                nxt = p_child[node, act]
                keep_going = (nxt >= 0) & ~p_done[jnp.maximum(nxt, 0)]
                node2 = jnp.where(nxt >= 0, nxt, node)
                return (
                    node2,
                    depth + 1,
                    path_n,
                    path_a,
                    keep_going,
                )

            init = (
                jnp.int32(0),
                jnp.int32(0),
                jnp.full((max_depth,), -1, jnp.int32),
                jnp.full((max_depth,), -1, jnp.int32),
                jnp.array(True),
            )
            node, depth, path_n, path_a, _ = lax.while_loop(cond, body, init)
            return node, depth, path_n, path_a

        sel_node, sel_depth, path_n, path_a = jax.vmap(select_one)(
            jnp.zeros((b,), jnp.int32), prior, visit, wsum, child, node_done
        )
        # The edge to expand is the last on the path.
        last = jnp.maximum(sel_depth - 1, 0)
        exp_parent = jnp.take_along_axis(path_n, last[:, None], axis=1)[:, 0]
        exp_action = jnp.take_along_axis(path_a, last[:, None], axis=1)[:, 0]
        already = (
            jnp.take_along_axis(
                child[jnp.arange(b), exp_parent], exp_action[:, None], axis=1
            )[:, 0]
            >= 0
        )  # terminal-node revisit: child exists but is done

        # ---- expansion: one exact env step per env.
        parent_states = node_states[jnp.arange(b), exp_parent]
        new_states, info = _step.step_states(parent_states, exp_action)
        slot = jnp.int32(sim + 1)
        new_probs, new_values = masked_policy(new_states)
        new_done = _state.game_ended(new_states)
        terminal_value = jnp.where(
            _state.turn(new_states) == 1,
            -_score.winning(new_states, komi),
            _score.winning(new_states, komi),
        )
        # leaf value from the LEAF mover's perspective
        leaf_value = jnp.where(new_done, terminal_value, new_values)

        write = ~already
        bidx = jnp.arange(b)
        node_states = node_states.at[bidx, slot].set(
            jnp.where(write[:, None, None, None], new_states, node_states[:, slot])
        )
        node_done = node_done.at[:, slot].set(
            jnp.where(write, new_done, node_done[:, slot])
        )
        prior = prior.at[bidx, slot].set(
            jnp.where(write[:, None], new_probs, prior[:, slot])
        )
        child = child.at[bidx, exp_parent, exp_action].set(
            jnp.where(write, slot, child[bidx, exp_parent, exp_action])
        )
        # Revisit of a terminal child: back up its exact outcome again.
        revisit_node = child[bidx, exp_parent, exp_action]
        revisit_states = node_states[bidx, revisit_node]
        revisit_value = jnp.where(
            _state.turn(revisit_states) == 1,
            -_score.winning(revisit_states, komi),
            _score.winning(revisit_states, komi),
        )
        leaf_value = jnp.where(already, revisit_value, leaf_value)

        # ---- backup along the path; value sign alternates per ply upward.
        # leaf_value is from the leaf mover's perspective; the edge into the
        # leaf belongs to the parent mover, i.e. -leaf_value at depth-1.
        def backup_one(p_visit, p_wsum, path_n, path_a, depth, v_leaf):
            def body(d, carry):
                pv, pw = carry
                on_path = d < depth
                node = jnp.maximum(path_n[d], 0)
                act = jnp.maximum(path_a[d], 0)
                # contribution sign: edge at depth d gets (-1)^(depth-d) * ...
                # Edge value from the edge-node mover's perspective: the
                # deepest edge sees the leaf as its child => -v_leaf, and
                # the sign alternates on the way up.
                steps_up = depth - 1 - d
                sign = jnp.where(steps_up % 2 == 0, -1.0, 1.0)
                val = sign * v_leaf
                pv = pv.at[node, act].add(jnp.where(on_path, 1, 0))
                pw = pw.at[node, act].add(jnp.where(on_path, val, 0.0))
                return pv, pw

            return lax.fori_loop(0, max_depth, body, (p_visit, p_wsum))

        visit, wsum = jax.vmap(backup_one)(
            visit, wsum, path_n, path_a, sel_depth, leaf_value
        )
        return node_states, node_done, prior, visit, wsum, child

    tree = (node_states, node_done, prior, visit, wsum, child)
    tree = lax.fori_loop(0, num_simulations, simulate, tree)
    node_states, node_done, prior, visit, wsum, child = tree

    root_visits = visit[:, 0]
    vp = root_visits.astype(jnp.float32)
    if temperature != 1.0:
        vp = jnp.power(vp, 1.0 / max(temperature, 1e-6))
    vp_sum = jnp.sum(vp, axis=-1, keepdims=True)
    uniform_valid = valid_root.astype(jnp.float32)
    uniform_valid = uniform_valid / jnp.sum(uniform_valid, -1, keepdims=True)
    visit_policy = jnp.where(vp_sum > 0, vp / jnp.maximum(vp_sum, 1), uniform_valid)

    root_q = jnp.sum(wsum[:, 0], axis=-1) / jnp.maximum(
        jnp.sum(root_visits, axis=-1), 1
    )
    actions = jax.random.categorical(
        pick_key, jnp.log(jnp.maximum(visit_policy, 1e-30)), axis=-1
    ).astype(jnp.int32)
    return MCTSResult(
        actions=actions,
        visit_policy=visit_policy,
        root_value=root_q,
        root_visits=root_visits,
    )


def make_mcts_policy(params, apply_fn, num_simulations=32, **kw):
    """Adapter: ``policy_fn(key, states) -> actions`` for batch_env.rollout."""

    def policy_fn(key, states):
        return run_mcts(
            key, states, params, apply_fn, num_simulations=num_simulations, **kw
        ).actions

    return policy_fn
