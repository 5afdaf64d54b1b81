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
from gymgo_tpu.rl import treewalk as _treewalk


class MCTSResult(NamedTuple):
    actions: jax.Array  # int32 (B,): sampled from the visit policy
    visit_policy: jax.Array  # f32 (B, A): normalized root visit counts
    root_value: jax.Array  # f32 (B,): mean root action value
    root_visits: jax.Array  # int32 (B, A)


class MCTSTree(NamedTuple):
    """Array-encoded search forest (one tree per env), returned by
    ``run_mcts(..., return_tree=True)`` for cross-move reuse — either the
    root-child statistics (``played_child_stats``) or the full played
    subtree (``compact_subtree`` -> ``run_mcts(warm_tree=...)``)."""

    node_states: jax.Array  # (B, M, 6, N, N)
    node_done: jax.Array  # bool (B, M)
    prior: jax.Array  # f32 (B, M, A)
    visit: jax.Array  # int32 (B, M, A)
    wsum: jax.Array  # f32 (B, M, A)
    child: jax.Array  # int32 (B, M, A), -1 = unexpanded
    parent: jax.Array  # int32 (B, M), -1 = root / unused slot


def empty_tree(b: int, r: int, a_size: int, state_shape, dtype=jnp.int8):
    """An all-cold warm tree (R slots): zero stats, no edges.  Feeding it
    as ``warm_tree`` is equivalent to a cold search (the root row is
    re-seeded by ``run_mcts`` itself)."""
    return MCTSTree(
        node_states=jnp.zeros((b, r) + tuple(state_shape), dtype),
        node_done=jnp.zeros((b, r), bool),
        prior=jnp.zeros((b, r, a_size), jnp.float32),
        visit=jnp.zeros((b, r, a_size), jnp.int32),
        wsum=jnp.zeros((b, r, a_size), jnp.float32),
        child=jnp.full((b, r, a_size), -1, jnp.int32),
        parent=jnp.full((b, r), -1, jnp.int32),
    )


def compact_subtree(
    tree: MCTSTree, actions: jax.Array, reuse_cap: int
) -> MCTSTree:
    """Extract the subtree rooted at the played child into ``reuse_cap``
    slots (new root at slot 0) — full cross-move tree reuse.

    Node slots are filled in expansion order, so a child's index always
    exceeds its parent's; membership is decided by pointer-doubling up the
    parent chain (O(log M) gathers), renumbering keeps old-index order, and
    truncation to the cap is therefore ancestry-closed (an ancestor always
    precedes its descendants).  Edges into dropped nodes keep their
    statistics but lose the child pointer (they re-expand on demand),
    exactly like the stats-only reuse path.  Envs whose played edge was
    never expanded come back all-cold.
    """
    b, m, a_size = tree.prior.shape
    r = reuse_cap
    bidx = jnp.arange(b)
    iota = jnp.arange(m, dtype=jnp.int32)[None, :]

    new_root = tree.child[bidx, 0, actions]  # (B,), -1 = cold
    has = new_root >= 0
    root_safe = jnp.maximum(new_root, 0)[:, None]

    # keep[j]: j is the new root or a descendant of it.  Pointer doubling:
    # after k rounds keep[j] is true iff the root lies within 2^k ancestor
    # hops, because each round ORs in the keep flag of the current 2^k-hop
    # ancestor before doubling the hop.
    keep = iota == root_safe
    jump = tree.parent
    hops = 1
    while hops < m:
        anc_keep = (
            jnp.take_along_axis(keep, jnp.maximum(jump, 0), axis=1)
            & (jump >= 0)
        )
        keep = keep | anc_keep
        jump = jnp.where(
            jump >= 0,
            jnp.take_along_axis(jump, jnp.maximum(jump, 0), axis=1),
            -1,
        )
        hops *= 2
    keep = keep & has[:, None]

    # Renumber: root -> 0, other kept nodes by old-index order; drop past cap.
    keep_nonroot = keep & (iota != root_safe)
    rank = jnp.cumsum(keep_nonroot.astype(jnp.int32), axis=1)  # inclusive
    newidx = jnp.where(iota == root_safe, 0, rank)
    final_keep = keep & (newidx < r)

    # perm[new] = old (scatter through a dump slot for dropped nodes).
    perm = jnp.full((b, r + 1), -1, jnp.int32)
    perm = perm.at[
        bidx[:, None], jnp.where(final_keep, newidx, r)
    ].set(jnp.broadcast_to(iota, (b, m)))[:, :r]
    live = perm >= 0
    psafe = jnp.maximum(perm, 0)

    def take(x, fill):
        g = x[bidx[:, None], psafe]
        mask = live.reshape((b, r) + (1,) * (g.ndim - 2))
        return jnp.where(mask, g, fill)

    # old -> new node-index map (-1 for dropped), applied to child/parent.
    old2new = jnp.where(final_keep, newidx, -1)

    child_old = take(tree.child, -1)
    child_new = jnp.where(
        child_old >= 0,
        jnp.take_along_axis(
            old2new, jnp.maximum(child_old, 0).reshape(b, -1), axis=1
        ).reshape(b, r, a_size),
        -1,
    )
    parent_old = take(tree.parent[..., None], -1)[..., 0]
    parent_new = jnp.where(
        parent_old >= 0,
        jnp.take_along_axis(old2new, jnp.maximum(parent_old, 0), axis=1),
        -1,
    )

    return MCTSTree(
        node_states=take(tree.node_states, jnp.zeros((), tree.node_states.dtype)),
        node_done=take(tree.node_done[..., None], False)[..., 0],
        prior=take(tree.prior, 0.0),
        visit=take(tree.visit, 0),
        wsum=take(tree.wsum, 0.0),
        child=child_new,
        parent=parent_new,
    )


def played_child_stats(tree: MCTSTree, actions: jax.Array):
    """Tree reuse across moves: (visit, wsum) of the root child reached by
    ``actions`` — feed as ``warm_root`` to the NEXT ply's ``run_mcts``.

    Stats are stored from each node mover's perspective, and the played
    child's mover IS the next search's root mover, so they carry over
    unchanged.  Unexpanded children yield zeros (cold start).  Callers must
    zero the stats for envs that reset between plies (fresh board ≠ child).
    """
    b = actions.shape[0]
    bidx = jnp.arange(b)
    c = tree.child[bidx, 0, actions]
    ok = (c >= 0)[:, None]
    safe = jnp.maximum(c, 0)
    return (
        jnp.where(ok, tree.visit[bidx, safe], 0),
        jnp.where(ok, tree.wsum[bidx, safe], 0.0),
    )


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
    num_parallel: int = 1,
    warm_root=None,
    warm_tree: MCTSTree | None = None,
    return_tree: bool = False,
    pass_min_stones: int = 0,
):
    """Run PUCT search from each state in the batch.  ``apply_fn(params, s)
    -> (logits, value)`` with value from the canonical mover's perspective.

    ``num_parallel`` (K) enables leaf-parallel search with batched virtual
    loss: each wave selects K paths per env — selections within a wave see
    earlier paths' edges penalized by K virtual losses (visit+1, value −1
    from the node mover's perspective), so the wave spreads over distinct
    leaves — then expands and network-evaluates all B*K leaves in ONE
    ``step_states`` + one ``apply_fn`` call, and backs up real values while
    discarding the virtual losses.  This cuts the sequential net/step calls
    K-fold (bigger MXU batches) at identical total simulation count; with
    K=1 the virtual-loss terms are identically zero and the search is the
    classic sequential PUCT.

    ``warm_root`` = (visit (B, A) int32, wsum (B, A) f32) seeds the root
    statistics — pass ``played_child_stats`` of the previous ply's tree to
    reuse search effort across moves.  ``warm_tree`` (from
    ``compact_subtree``) seeds the FULL subtree: its R slots occupy node
    indices [0, R) (slot 0 must be the new root; its state/prior are
    re-seeded here from ``states`` and a fresh noisy prior) and new
    expansions fill [R, R + num_simulations).  ``return_tree=True`` returns
    ``(MCTSResult, MCTSTree)``.
    """
    if num_simulations % num_parallel != 0:
        raise ValueError("num_simulations must be a multiple of num_parallel")
    if warm_root is not None and warm_tree is not None:
        raise ValueError("pass at most one of warm_root / warm_tree")
    k_par = num_parallel
    num_waves = num_simulations // k_par
    b = states.shape[0]
    n = states.shape[-1]
    a_size = n * n + 1
    r_slots = 1 if warm_tree is None else warm_tree.prior.shape[1]
    m = num_simulations + r_slots  # node slots
    max_depth = m

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
    # Self-play opening constraint on the ROOT action set only (interior
    # nodes search the full rules); see actions.mask_early_pass.
    valid_root = _actions.mask_early_pass(valid_root, states, pass_min_stones)
    root_prior = jnp.where(valid_root, root_prior, 0.0)
    noisy = root_prior * (1 - dirichlet_fraction) + noise * dirichlet_fraction
    noisy = jnp.where(valid_root, noisy, 0.0)
    root_prior = noisy / jnp.sum(noisy, axis=-1, keepdims=True)

    # Tree arrays.
    node_states = jnp.zeros((b, m) + states.shape[1:], states.dtype)
    node_done = jnp.zeros((b, m), bool)
    prior = jnp.zeros((b, m, a_size), jnp.float32)
    visit = jnp.zeros((b, m, a_size), jnp.int32)
    wsum = jnp.zeros((b, m, a_size), jnp.float32)
    child = jnp.full((b, m, a_size), -1, jnp.int32)
    parent = jnp.full((b, m), -1, jnp.int32)
    if warm_tree is not None:
        node_states = node_states.at[:, :r_slots].set(warm_tree.node_states)
        node_done = node_done.at[:, :r_slots].set(warm_tree.node_done)
        prior = prior.at[:, :r_slots].set(warm_tree.prior)
        visit = visit.at[:, :r_slots].set(warm_tree.visit)
        wsum = wsum.at[:, :r_slots].set(warm_tree.wsum)
        child = child.at[:, :r_slots].set(warm_tree.child)
        parent = parent.at[:, :r_slots].set(warm_tree.parent)
    # (re-)seed the root row: exact current state, fresh noisy prior (AZ
    # root exploration noise), done flag; carried visit/wsum/child stay.
    node_states = node_states.at[:, 0].set(states)
    node_done = node_done.at[:, 0].set(_state.game_ended(states))
    prior = prior.at[:, 0].set(root_prior)
    parent = parent.at[:, 0].set(-1)
    if warm_root is not None:
        warm_visit, warm_wsum = warm_root
        visit = visit.at[:, 0].set(warm_visit.astype(jnp.int32))
        wsum = wsum.at[:, 0].set(warm_wsum.astype(jnp.float32))
    if warm_root is not None or warm_tree is not None:
        # Carried root stats were accumulated when this node was interior
        # and searched the FULL rules: they can hold visits on actions that
        # are no longer legal at the new root (a point the opponent just
        # filled, a new ko) or that the root constraint excludes (early
        # pass, mask_early_pass).  Selection cannot revisit them (prior 0),
        # but the final visit_policy samples raw root visits — mask them.
        visit = visit.at[:, 0].set(jnp.where(valid_root, visit[:, 0], 0))
        wsum = wsum.at[:, 0].set(jnp.where(valid_root, wsum[:, 0], 0.0))

    def simulate(sim, tree):
        node_states, node_done, prior, visit, wsum, child, parent = tree

        # ---- selection: tree stats are frozen during one walk, so the
        # per-node PUCT argmax / child pointer / continue flag are
        # precomputed for ALL nodes with elementwise passes (no gathers),
        # then the descent chases pointers through (B, M) tables
        # (treewalk.walk_paths — see that module for the cost argument).
        def select_paths(eff_visit, eff_wsum):
            scores = _puct_scores(prior, eff_visit, eff_wsum, c_puct)
            scores = jnp.where(prior > 0, scores, -jnp.inf)
            tables = _treewalk.node_tables(scores, child, node_done)
            return _treewalk.walk_paths(*tables, max_depth)

        # ---- backup along the path; value sign alternates per ply upward.
        # leaf_value is from the leaf mover's perspective; the edge into the
        # leaf belongs to the parent mover, i.e. -leaf_value at depth-1.
        # ONE batched scatter-add per array covers the whole path ((node,
        # act) pairs on a path are distinct — strict descent — so update
        # order is immaterial and results are bit-identical to the
        # sequential per-depth loop, at 1/max_depth the scatter count).
        depth_iota = jnp.arange(max_depth)

        def backup_one(p_visit, p_wsum, path_n, path_a, depth, v_leaf):
            on_path = depth_iota < depth
            nodes = jnp.where(on_path, path_n, 0)
            acts = jnp.where(on_path, path_a, 0)
            # edge at depth d gets (-1)^(depth-1-d) * v_leaf: the deepest
            # edge sees the leaf as its child => -v_leaf, alternating up.
            steps_up = depth - 1 - depth_iota
            sign = jnp.where(steps_up % 2 == 0, -1.0, 1.0)
            pv = p_visit.at[nodes, acts].add(on_path.astype(jnp.int32))
            pw = p_wsum.at[nodes, acts].add(
                jnp.where(on_path, sign * v_leaf, 0.0)
            )
            return pv, pw

        # virtual loss: pretend each in-flight path's edges were visited and
        # lost (node mover's perspective), so later selections in the same
        # wave spread to different leaves.
        def vloss_one(p_vn, path_n, path_a, depth):
            on_path = depth_iota < depth
            nodes = jnp.where(on_path, path_n, 0)
            acts = jnp.where(on_path, path_a, 0)
            return p_vn.at[nodes, acts].add(on_path.astype(jnp.int32))

        # ---- K selections (batched virtual loss between them).
        if k_par == 1:
            paths = [select_paths(visit, wsum)]
        else:
            vn = jnp.zeros((b, m, a_size), jnp.int32)
            paths = []
            for k in range(k_par):
                sel_depth, path_n, path_a = select_paths(
                    visit + vn, wsum - vn.astype(jnp.float32)
                )
                paths.append((sel_depth, path_n, path_a))
                if k < k_par - 1:
                    vn = jax.vmap(vloss_one)(vn, path_n, path_a, sel_depth)

        # ---- batched expansion: the edge to expand is the last on each
        # path; ONE exact env step + ONE network call covers all K waves'
        # leaves (B*K rows).
        bidx = jnp.arange(b)
        exp_parents, exp_actions = [], []
        for (sel_depth, path_n, path_a) in paths:
            last = jnp.maximum(sel_depth - 1, 0)
            exp_parents.append(
                jnp.take_along_axis(path_n, last[:, None], axis=1)[:, 0]
            )
            exp_actions.append(
                jnp.take_along_axis(path_a, last[:, None], axis=1)[:, 0]
            )
        parent_states = jnp.concatenate(
            [node_states[bidx, p] for p in exp_parents], axis=0
        )
        new_states_all, _ = _step.step_states(
            parent_states, jnp.concatenate(exp_actions, axis=0)
        )
        new_probs_all, new_values_all = masked_policy(new_states_all)
        new_done_all = _state.game_ended(new_states_all)
        terminal_all = jnp.where(
            _state.turn(new_states_all) == 1,
            -_score.winning(new_states_all, komi),
            _score.winning(new_states_all, komi),
        )
        # leaf value from the LEAF mover's perspective.  When the selected
        # edge already has a child (terminal revisit, or a within-wave
        # duplicate), re-stepping the parent reproduces that child's exact
        # state, so leaf_all is the correct backup value in every case and
        # ``already`` only gates the node writes.
        leaf_all = jnp.where(new_done_all, terminal_all, new_values_all)

        for k in range(k_par):
            sel_depth, path_n, path_a = paths[k]
            exp_parent, exp_action = exp_parents[k], exp_actions[k]
            sl = slice(k * b, (k + 1) * b)
            new_states = new_states_all[sl]
            already = (
                jnp.take_along_axis(
                    child[bidx, exp_parent], exp_action[:, None], axis=1
                )[:, 0]
                >= 0
            )
            write = ~already
            slot = r_slots + sim * k_par + k
            node_states = node_states.at[bidx, slot].set(
                jnp.where(
                    write[:, None, None, None], new_states, node_states[bidx, slot]
                )
            )
            node_done = node_done.at[bidx, slot].set(
                jnp.where(write, new_done_all[sl], node_done[bidx, slot])
            )
            prior = prior.at[bidx, slot].set(
                jnp.where(write[:, None], new_probs_all[sl], prior[bidx, slot])
            )
            child = child.at[bidx, exp_parent, exp_action].set(
                jnp.where(write, slot, child[bidx, exp_parent, exp_action])
            )
            parent = parent.at[bidx, slot].set(
                jnp.where(write, exp_parent, parent[bidx, slot])
            )
            visit, wsum = jax.vmap(backup_one)(
                visit, wsum, path_n, path_a, sel_depth, leaf_all[sl]
            )
        return node_states, node_done, prior, visit, wsum, child, parent

    tree = (node_states, node_done, prior, visit, wsum, child, parent)
    tree = lax.fori_loop(0, num_waves, simulate, tree)
    node_states, node_done, prior, visit, wsum, child, parent = tree

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
    result = MCTSResult(
        actions=actions,
        visit_policy=visit_policy,
        root_value=root_q,
        root_visits=root_visits,
    )
    if return_tree:
        return result, MCTSTree(
            node_states, node_done, prior, visit, wsum, child, parent
        )
    return result


def make_mcts_policy(params, apply_fn, num_simulations=32, **kw):
    """Adapter: ``policy_fn(key, states) -> actions`` for batch_env.rollout."""

    def policy_fn(key, states):
        return run_mcts(
            key, states, params, apply_fn, num_simulations=num_simulations, **kw
        ).actions

    return policy_fn
