"""Gather-free batched tree-descent for on-device MCTS.

The selection walk used to re-gather the current node's (prior, visit,
wsum) rows from the (B, M, A) tree arrays at EVERY depth step
(``take_along_axis`` per iteration) — measured at ~73% of search time and
super-linear in batch (BENCHMARKS.md "Search cost isolation").  The fix
exploits that tree statistics are FROZEN during one selection walk: the
per-node argmax action, its child pointer, and its continue flag can all be
precomputed for every node at once with elementwise passes over (B, M, A)
(no gathers), after which the walk itself only chases pointers through
tiny (B, M) tables via one-hot masked reduces.  TPU gathers at (B, 362)
scale cost ~70us each; one-hot reduces over M = O(sims) node slots are
noise, and the per-depth loop body touches no (B, M, A) array at all.

Callers build the tables with their own scoring rule (PUCT / Gumbel
completed-Q) via :func:`node_tables` and hand them to :func:`walk_paths`.
Semantics are identical to the per-env while_loop they replace (the walk
from /root/reference's one-ply ``children`` contract generalized to
multi-ply descent): start at node 0, take the argmax edge, record it,
continue while the edge's child exists and is non-terminal.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _lookup_done(nxt, node_done):
    """node_done[b, nxt] via one-hot reduce (False where nxt < 0).

    ``nxt`` is int32 (B,) or (B, M); ``node_done`` is bool (B, M).
    """
    m = node_done.shape[1]
    iota_m = jnp.arange(m, dtype=jnp.int32)
    eq = jnp.maximum(nxt, 0)[..., None] == iota_m  # (..., M)
    done_b = node_done[:, None, :] if nxt.ndim == 2 else node_done
    return jnp.any(eq & done_b, axis=-1)


def node_tables(scores, child, node_done):
    """Per-node descent tables from frozen tree stats.

    Args:
      scores: f32 (B, M, A) selection scores, already masked with -inf on
        non-selectable actions.
      child: int32 (B, M, A) child pointers, -1 = unexpanded.
      node_done: bool (B, M) terminal flags.

    Returns:
      best_act: int32 (B, M) argmax action per node.
      nxt_tab: int32 (B, M) child reached by best_act (-1 = unexpanded).
      keep_tab: bool (B, M) True iff the walk continues past this node
        (expanded child that is not terminal).
    """
    a_size = scores.shape[-1]
    best_act = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # (B, M)
    # child[b, m, best_act] via one-hot reduce: exactly one lane selected,
    # and the fill for unselected lanes is 0, so adding the selected lane's
    # (value + 1) and subtracting 1 keeps -1 pointers intact.
    onehot = best_act[..., None] == jnp.arange(a_size, dtype=jnp.int32)
    nxt_tab = jnp.sum(jnp.where(onehot, child + 1, 0), axis=-1) - 1
    keep_tab = (nxt_tab >= 0) & ~_lookup_done(nxt_tab, node_done)
    return best_act, nxt_tab, keep_tab


def gather_edge(arr, parent, action):
    """arr[b, parent[b], action[b]] for (B, M, A) ``arr`` — gather-free
    (one one-hot reduce over M, one over A).  Correct for -1 sentinel
    values via the +1/-1 trick."""
    b, m, a_size = arr.shape
    ohm = parent[:, None] == jnp.arange(m, dtype=jnp.int32)
    row = jnp.sum(jnp.where(ohm[..., None], arr + 1, 0), axis=1)  # (B, A)
    oha = action[:, None] == jnp.arange(a_size, dtype=jnp.int32)
    return jnp.sum(jnp.where(oha, row, 0), axis=1) - 1


def gather_node(arr, node):
    """arr[b, node[b]] for (B, M) ``arr`` — gather-free one-hot reduce.
    ``node`` must be in range (clamp or mask at the call site)."""
    m = arr.shape[1]
    oh = node[:, None] == jnp.arange(m, dtype=jnp.int32)
    return jnp.sum(jnp.where(oh, arr, 0), axis=1)


def forced_root_edge(forced_act, child, node_done):
    """Tables for a FORCED action at the root (the depth-0 edge), used by
    Gumbel search where sequential halving dictates the root action.

    Args:
      forced_act: int32 (B,) root action per env.
      child / node_done: as in :func:`node_tables`.

    Returns:
      (forced_nxt (B,) int32, forced_keep (B,) bool) for node 0.
    """
    a_size = child.shape[-1]
    onehot = forced_act[:, None] == jnp.arange(a_size, dtype=jnp.int32)
    forced_nxt = jnp.sum(jnp.where(onehot, child[:, 0] + 1, 0), axis=-1) - 1
    forced_keep = (forced_nxt >= 0) & ~_lookup_done(forced_nxt, node_done)
    return forced_nxt, forced_keep


def walk_paths(best_act, nxt_tab, keep_tab, max_depth: int, forced_root=None):
    """Descend every env's tree from node 0 along the precomputed tables.

    Per iteration the only per-node state fetched is a one-hot masked
    reduce over the (B, M) tables — no (B, M, A) traffic at all.  Lanes
    stop independently (``open_``) exactly like the vmapped per-env
    while_loop this replaces: ``open_`` is monotonically decreasing, so a
    lane's private depth equals the global iteration index while it is
    open, and path layouts come out identical.

    Args:
      best_act / nxt_tab / keep_tab: from :func:`node_tables`.
      max_depth: static walk bound (path array length).
      forced_root: optional (act (B,), nxt (B,), keep (B,)) overriding the
        depth-0 edge (Gumbel root action, from :func:`forced_root_edge`).

    Returns:
      depth: int32 (B,) path lengths (>= 1).
      path_n: int32 (B, max_depth) node indices (-1 past the path).
      path_a: int32 (B, max_depth) action indices (-1 past the path).
    """
    b, m = best_act.shape
    iota_m = jnp.arange(m, dtype=jnp.int32)

    def cond(c):
        node, depth, depth_b, path_n, path_a, open_ = c
        return jnp.any(open_) & (depth < max_depth)

    def body(c):
        node, depth, depth_b, path_n, path_a, open_ = c
        oh = node[:, None] == iota_m  # (B, M)
        act = jnp.sum(jnp.where(oh, best_act, 0), axis=-1)
        nxt = jnp.sum(jnp.where(oh, nxt_tab + 1, 0), axis=-1) - 1
        keep = jnp.any(oh & keep_tab, axis=-1)
        if forced_root is not None:
            f_act, f_nxt, f_keep = forced_root
            at_root = depth == 0
            act = jnp.where(at_root, f_act, act)
            nxt = jnp.where(at_root, f_nxt, nxt)
            keep = jnp.where(at_root, f_keep, keep)
        # Column `depth` was never written before (depth strictly
        # increases), so closed lanes just re-write the -1 init.
        path_n = lax.dynamic_update_slice(
            path_n, jnp.where(open_, node, -1)[:, None], (0, depth)
        )
        path_a = lax.dynamic_update_slice(
            path_a, jnp.where(open_, act, -1)[:, None], (0, depth)
        )
        depth_b = depth_b + open_.astype(jnp.int32)
        node = jnp.where(open_ & (nxt >= 0), nxt, node)
        open_ = open_ & keep
        return node, depth + 1, depth_b, path_n, path_a, open_

    init = (
        jnp.zeros((b,), jnp.int32),
        jnp.int32(0),
        jnp.zeros((b,), jnp.int32),
        jnp.full((b, max_depth), -1, jnp.int32),
        jnp.full((b, max_depth), -1, jnp.int32),
        jnp.ones((b,), bool),
    )
    _, _, depth_b, path_n, path_a, _ = lax.while_loop(cond, body, init)
    return depth_b, path_n, path_a
