"""Action-space utilities: move masks, children expansion, action sampling.

Parity targets: /root/reference/gym_go/gogame.py:153-186 (masks, children)
and :385-404 (random policies; reimplemented on ``jax.random`` for the
on-device path — host-side numpy parity sampling lives in the adapters).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gymgo_tpu import govars
from gymgo_tpu.core.step import step_states

__all__ = [
    "batch_invalid_moves",
    "batch_valid_moves",
    "children",
    "uniform_random_actions",
    "weighted_random_actions",
    "mask_early_pass",
]


def batch_invalid_moves(states: jax.Array) -> jax.Array:
    """Flat invalid-move vectors ``(B, N*N+1)``; pass (last column) always 0.

    Matches the reference *batch* accessor (gogame.py:164-168), which has no
    game-ended branch; the single-state quirk (all-moves-valid once the game
    is over, gogame.py:155-156) is reproduced by ``ended_all_valid=True``
    callers in the facade layer.
    """
    b = states.shape[0]
    flat = states[:, govars.INVD_CHNL].reshape(b, -1).astype(jnp.float32)
    return jnp.concatenate([flat, jnp.zeros((b, 1), jnp.float32)], axis=1)


def batch_valid_moves(states: jax.Array) -> jax.Array:
    return 1.0 - batch_invalid_moves(states)


def mask_early_pass(valid, states, min_stones: int):
    """Disallow pass while the board holds fewer than ``min_stones`` stones
    and another legal move exists.

    Self-play cold-start constraint (the MiniGo-style "no pass before move
    N" rule, keyed on the Markov stone count instead of a move counter so it
    composes with auto-reset): nets bootstrapped from degenerate ultra-short
    mutual-pass games learn "pass when ahead", which is equilibrium play
    against themselves but loses tempo after tempo against any opponent who
    keeps playing.  Forcing self-play games past the opening produces real
    game data; pass is always allowed once no other legal move exists.

    ``valid``: bool/0-1 (B, N*N+1) with pass last; returns bool."""
    valid = valid > 0 if valid.dtype != jnp.bool_ else valid
    if min_stones <= 0:
        return valid
    b = states.shape[0]
    stones = jnp.sum(
        states[:, :2].astype(jnp.int32).reshape(b, -1), axis=1
    )
    board_any = jnp.any(valid[:, :-1], axis=1)
    allow_pass = (stones >= min_stones) | ~board_any
    return valid.at[:, -1].set(valid[:, -1] & allow_pass)


def children(state: jax.Array, canonical: bool = False) -> jax.Array:
    """One-ply expansion of a single state: ``(N*N+1, 6, N, N)``.

    Row a holds next_state(state, a) for valid a, and zeros for invalid a —
    the reference's ``padded=True`` layout (gogame.py:175-186), which is the
    only shape expressible under jit; unpadded filtering happens host-side.
    """
    from gymgo_tpu.core.transform import batch_canonical_form

    n = state.shape[-1]
    num_actions = n * n + 1
    tiled = jnp.broadcast_to(state[None], (num_actions,) + state.shape)
    actions = jnp.arange(num_actions, dtype=jnp.int32)
    stepped, info = step_states(tiled, actions)
    if canonical:
        stepped = batch_canonical_form(stepped)
    ended = state[govars.DONE_CHNL, 0, 0] != 0
    valid = ~info.invalid_action | ended  # gogame.py:155-156: all valid once done
    return jnp.where(valid[:, None, None, None], stepped, 0).astype(state.dtype)


def _kth_valid_actions(key: jax.Array, valid_board: jax.Array) -> jax.Array:
    """Uniform draw over {valid board moves} ∪ {pass} given a (B, N*N) bool
    valid-board-move mask.

    One random word per env instead of one per (env, action): draw
    k ~ U[0, num_valid], then select the k-th valid move by rank (cumsative
    count along the flat board; pass ranks last).  The RNG is the sampler's
    real cost at production batch sizes — threefry on (B, 362) words is
    ~360x more VPU work than (B,) words; the cumsum is a few cheap int16
    passes.  Distribution: exactly uniform up to randint's 2^-32 modulo
    bias (immeasurable at 362 outcomes)."""
    b, m = valid_board.shape
    n = int(round(m ** 0.5))
    if n * n != m:
        csum = jnp.cumsum(valid_board.astype(jnp.int16), axis=-1)
        num_board = csum[:, -1].astype(jnp.int32)
        k = jax.random.randint(key, (b,), 0, num_board + 1)
        target = (k + 1).astype(jnp.int16)
        hit = valid_board & (csum == target[:, None])
        board_choice = jnp.argmax(hit, axis=-1).astype(jnp.int32)
        return jnp.where(k == num_board, m, board_choice).astype(jnp.int32)

    # Two-level rank-select: pick the k-th valid flat move via (row, col).
    # A full-width cumsum costs ~log2(m) doubling passes over (B, m) plus a
    # full-width compare+argmax; here only a per-row popcount and a one-hot
    # row extraction touch (B, m) — everything else is (B, n).  The chosen
    # action is IDENTICAL to the flat k-th-valid for the same draw k.
    v = valid_board.reshape(b, n, n)
    row_cnt = jnp.sum(v, axis=2, dtype=jnp.int16)          # (B, n)
    row_csum = jnp.cumsum(row_cnt, axis=1)                 # (B, n) small
    num_board = row_csum[:, -1].astype(jnp.int32)
    k = jax.random.randint(key, (b,), 0, num_board + 1)    # == num_board -> pass
    k16 = k.astype(jnp.int16)
    r = jnp.argmax(row_csum > k16[:, None], axis=1).astype(jnp.int16)
    iota_n = jnp.arange(n, dtype=jnp.int16)
    rmask = iota_n[None, :] == r[:, None]                  # (B, n)
    before = jnp.sum(
        jnp.where(rmask, row_csum - row_cnt, jnp.int16(0)), axis=1
    )                                                      # valids before row r
    within = k16 - before + jnp.int16(1)                   # 1-based rank in row
    vrow = jnp.sum(
        jnp.where(rmask[:, :, None], v.astype(jnp.int8), jnp.int8(0)), axis=1
    )                                                      # (B, n) row r's bits
    ccol = jnp.cumsum(vrow.astype(jnp.int16), axis=1)
    col = jnp.argmax((vrow != 0) & (ccol == within[:, None]), axis=1)
    board_choice = r.astype(jnp.int32) * n + col.astype(jnp.int32)
    return jnp.where(k == num_board, m, board_choice).astype(jnp.int32)


def uniform_random_actions(key: jax.Array, states: jax.Array) -> jax.Array:
    """Uniform draw over each env's valid actions (pass included) — the
    batched, on-device analog of go_env.py:78-81."""
    b = states.shape[0]
    valid = states[:, govars.INVD_CHNL].reshape(b, -1) == 0
    return _kth_valid_actions(key, valid)


def uniform_random_actions_planes(key: jax.Array, ps) -> jax.Array:
    """Planes-carry variant of ``uniform_random_actions`` (same distribution;
    reads the invd plane directly)."""
    b = ps.invd.shape[0]
    return _kth_valid_actions(key, ~ps.invd.reshape(b, -1))


def weighted_random_actions(key: jax.Array, weights: jax.Array) -> jax.Array:
    """Sample actions proportional to non-negative ``weights`` (B, N*N+1);
    invalid moves are assumed to carry weight 0 (gogame.py:385-392)."""
    logits = jnp.where(weights > 0, jnp.log(jnp.maximum(weights, 1e-30)), -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
