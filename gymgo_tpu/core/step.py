"""The batched Go state-transition kernel — one fused, jittable step.

Semantics follow the reference's *single-state* path ``gogame.next_state``
(/root/reference/gym_go/gogame.py:34-87) exactly, vectorized over a leading
batch dim with zero Python in the loop:

  * pass bookkeeping and double-pass game end        (gogame.py:48-53)
  * stone placement                                  (gogame.py:62)
  * capture resolution                               (state_utils.py:159-180)
  * simple-ko detection                              (gogame.py:65-75,
                                                      state_utils.py:214-223)
  * invalid-move mask incl. suicide rule             (state_utils.py:24-83)
  * turn flip                                        (state_utils.py:235-241)

The reference's batch path has a known capture-misalignment bug when passes
and captures mix in one batch (batch_update_pieces zips full-batch arrays
against non-pass-indexed ones, state_utils.py:183-211); this engine
deliberately applies per-env single-state semantics instead.

Where the reference raises on bad input (invalid move: gogame.py:59; stepping
a finished game: go_env.py:54), raising is impossible under ``jit``; the env
in question is left unchanged ("frozen") and flagged in ``StepInfo`` so
host-side adapters can raise with identical observable behavior.

Label-free algorithm notes
--------------------------
Captures: after placement, an opponent stone survives iff its 4-connected
group contains a stone adjacent to an empty cell — an OR-flood
(`flood_or`).  Only groups adjacent to the new stone can be captured (every
group had a liberty before the move), so flooding the whole board is
equivalent to the reference's adjacent-group loop.

Invalid mask: the reference's per-group liberty *counts* are only ever
compared against 1 (state_utils.py:70-74).  A stone's group has 0 / exactly 1
/ >=2 distinct liberty cells iff the (min, max) flat index over the group's
adjacent empty cells satisfies mn==BIG / mn==mx<BIG / mn<mx; (min, max)
propagate within same-color components (`flood_min_max_two_colors`).  Then,
for an empty point p (next player to move):

  possible(p) = p adjacent to a mover group with >=2 liberties
                or to a next-player group in atari (p is then its sole liberty)
  definite(p) = p adjacent to a mover group in atari (p captures it)
                or to a next-player group with >=2 liberties
  invalid     = occupied | (possible & ~definite & fully-surrounded) | ko

which is the booleanization of state_utils.py:70-82 (only the >0 / ==0 tests
of the accumulated sums matter there), hence bit-exact.

Ko: exactly one stone captured implies exactly one single-stone group
captured, so the reference's (one group) and (one stone) tests collapse to
``captured_count == 1``; combined with the surrounded-pre-capture probe it
reproduces gogame.py:72-75.
"""

from __future__ import annotations

import os as _os

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gymgo_tpu import govars
from gymgo_tpu.core.flood import (
    flood_or_best as flood_or,
    flood_bundle_best as flood_bundle,
    neighbor_count_edge1,
    neighbor_or,
    shift,
)

# benchmark-only ablation switches (comma list): skip step components to
# decompose per-step cost; results are WRONG with any of these set.
_ABLATE = frozenset(
    x for x in _os.environ.get("GYMGO_ABLATE", "").split(",") if x
)

__all__ = [
    "StepInfo",
    "PlanesState",
    "step_states",
    "step_planes",
    "planes_from_states",
    "states_from_planes",
    "invalid_action_flags",
    "init_atari",
]


class StepInfo(NamedTuple):
    """Per-env diagnostics emitted by ``step_states``."""

    invalid_action: jax.Array  # bool (B,): move hit INVD_CHNL or out of range
    was_done: jax.Array  # bool (B,): env was already finished at entry
    num_captured: jax.Array  # int32 (B,): opponent stones removed this step
    black_area: jax.Array  # int32 (B,): Trump-Taylor area of the result state
    white_area: jax.Array  # int32 (B,): (frozen envs report their unchanged state)


class PlanesState(NamedTuple):
    """Bandwidth-optimal env-state carry for scanned rollouts.

    The canonical (B, 6, N, N) layout stores TURN/PASS/DONE as whole planes
    (reference contract); inside a rollout those are redundant — carrying
    them as per-env bits halves the state traffic of every step.  Converters
    are exact inverses; ``step_planes`` is the core transition and
    ``step_states`` a thin wrapper, so both paths are one implementation.
    """

    black: jax.Array  # bool (B, N, N)
    white: jax.Array  # bool (B, N, N)
    invd: jax.Array  # bool (B, N, N)
    white_to_move: jax.Array  # bool (B,)
    prev_passed: jax.Array  # bool (B,)
    done: jax.Array  # bool (B,)
    # Optional carried-capture accelerator: int16 (B, N, N), per stone the
    # flat index + 1 of its group's SOLE liberty when the group is in atari,
    # 0 otherwise.  The previous step's classification flood produces it for
    # free; with it, capture resolution needs no flood at all (a group dies
    # iff its sole liberty is the point just played).  ``None`` (the default,
    # e.g. from ``planes_from_states``) selects the stateless flood path.
    # Zero-filling on auto-reset is consistent: an empty board has no stones.
    atari: jax.Array | None = None
    # Optional carried ko-probe accelerator: bool (B, N, N), per cell whether
    # ALL its in-bounds neighbors hold stones of the player who will be the
    # opponent on the NEXT step (exactly next step's adj_data "surrounded"
    # map, state_utils.py:214-223).  Produced for free by the step's packed
    # invalid-mask dilation; with it the ko probe needs no shifts at all.
    # Zero-filling on auto-reset is consistent: nothing is surrounded on an
    # empty board.  ``None`` selects the stateless inline computation.
    ko_surr: jax.Array | None = None


def planes_from_states(states: jax.Array) -> PlanesState:
    return PlanesState(
        black=states[:, govars.BLACK].astype(jnp.bool_),
        white=states[:, govars.WHITE].astype(jnp.bool_),
        invd=states[:, govars.INVD_CHNL].astype(jnp.bool_),
        white_to_move=states[:, govars.TURN_CHNL, 0, 0].astype(jnp.bool_),
        prev_passed=states[:, govars.PASS_CHNL, 0, 0].astype(jnp.bool_),
        done=states[:, govars.DONE_CHNL, 0, 0].astype(jnp.bool_),
    )


def states_from_planes(ps: PlanesState, dtype=jnp.int8) -> jax.Array:
    b, n, _ = ps.black.shape
    plane = lambda v: jnp.broadcast_to(v[:, None, None], (b, n, n))
    return jnp.stack(
        [
            ps.black,
            ps.white,
            plane(ps.white_to_move),
            ps.invd,
            plane(ps.prev_passed),
            plane(ps.done),
        ],
        axis=1,
    ).astype(dtype)


def init_ko_surr(ps: PlanesState) -> jax.Array:
    """Seed the carried ko-surround map for an arbitrary board: per cell,
    all in-bounds neighbors hold stones of the player NOT to move (the
    next step's pre-capture opponent)."""
    wtm = ps.white_to_move[:, None, None]
    opp = jnp.where(wtm, ps.black, ps.white)
    t = jnp.ones((), jnp.bool_)
    return (
        shift(opp, 1, 0, t) & shift(opp, -1, 0, t)
        & shift(opp, 0, 1, t) & shift(opp, 0, -1, t)
    )


def init_atari(ps: PlanesState) -> jax.Array:
    """Seed the carried-capture atari encoding for an arbitrary board.

    One classification flood over the current position; every subsequent
    ``step_planes`` refreshes the encoding for free (it falls out of the
    step's own invalid-mask flood), so a rollout pays this exactly once.
    """
    n = ps.black.shape[-1]
    return flood_bundle(ps.black, ps.white, n)[4]


def invalid_action_flags(states, actions):
    """bool (B,): action is out of range, or a board move into INVD_CHNL."""
    n = states.shape[-1]
    pass_idx = n * n
    actions = actions.astype(jnp.int32)
    oob = (actions < 0) | (actions > pass_idx)
    is_pass = actions == pass_idx
    flat_invd = states[:, govars.INVD_CHNL].reshape(states.shape[0], -1)
    board_idx = jnp.clip(actions, 0, pass_idx - 1)
    hit = jnp.take_along_axis(flat_invd, board_idx[:, None], axis=1)[:, 0] != 0
    return oob | (~is_pass & hit)


def step_planes(ps: PlanesState, actions: jax.Array):
    """Core transition on the planes carry; see ``step_states``."""
    b, n, _ = ps.black.shape
    pass_idx = n * n

    black, white = ps.black, ps.white
    white_to_move, prev_passed, done = ps.white_to_move, ps.prev_passed, ps.done

    actions = actions.astype(jnp.int32)
    is_pass = actions == pass_idx
    oob = (actions < 0) | (actions > pass_idx)
    board_idx = jnp.clip(actions, 0, pass_idx - 1)
    row = board_idx // n
    col = board_idx % n

    # One-hot placement mask (all-false for pass envs).  Doubles as the
    # "value at the played point" probe: gathers (take_along_axis) cost
    # ~70us each on TPU at B=4096 while a masked any-reduce over an
    # already-materialized mask is ~3x cheaper and fuses with neighbors.
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, n, n), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, n, n), 2)
    place = (
        (rows == row[:, None, None])
        & (cols == col[:, None, None])
        & ~is_pass[:, None, None]
    )

    def at_place(plane):
        return jnp.any((plane & place).reshape(b, -1), axis=1)

    if "hit" in _ABLATE:
        invalid_action = oob
    else:
        invalid_action = oob | at_place(ps.invd)

    # Mover / opponent planes (per-env select on the turn bit).
    wtm = white_to_move[:, None, None]
    mover = jnp.where(wtm, white, black)
    opp = jnp.where(wtm, black, white)
    mover = mover | place

    # Ko probe: all in-bounds neighbors of the move hold opponent stones,
    # evaluated pre-capture with board edges counting as satisfied
    # (state_utils.py:214-223 keeps only in-bounds neighbors).
    if "ko" in _ABLATE:
        surrounded_pre = is_pass
    elif ps.ko_surr is not None:
        surrounded_pre = at_place(ps.ko_surr)
    else:
        t = jnp.ones((), jnp.bool_)
        surrounded_map = (
            shift(opp, 1, 0, t) & shift(opp, -1, 0, t) & shift(opp, 0, 1, t) & shift(opp, 0, -1, t)
        )
        surrounded_pre = at_place(surrounded_map)

    # Capture resolution: opponent stones whose group has no liberty die.
    # An opponent group loses its last liberty this step iff its sole
    # liberty (pre-move) is exactly the placed point, so when the previous
    # step's classification is carried (ps.atari) no flood is needed.
    if ps.atari is None:
        empty_after_place = ~(mover | opp)
        has_lib = flood_or(opp & neighbor_or(empty_after_place), opp)
        killed = opp & ~has_lib & ~is_pass[:, None, None]
    else:
        placed_enc = (board_idx + 1).astype(jnp.int16)
        killed = (
            opp
            & (ps.atari == placed_enc[:, None, None])
            & ~is_pass[:, None, None]
        )
    opp = opp & ~killed

    # Invalid-move mask for the next player, on the post-capture board:
    # classify every stone's group by distinct-liberty count (0 / 1 / >=2).
    # Trump-Taylor claim bits ride the same flood (scoring is ~free), so the
    # boards are frozen-resolved FIRST: frozen envs flood their unchanged
    # state (classification output is discarded for them, but the areas must
    # describe the state they actually keep).
    frozen = done | invalid_action
    fz = frozen[:, None, None]
    mover = jnp.where(fz, black, mover)
    opp = jnp.where(fz, white, opp)
    mover_is_white = jnp.where(frozen, False, white_to_move)

    all_pieces = mover | opp
    empty = ~all_pieces
    cell_idx = rows * n + cols

    # Capture count and the (sole) captured cell's index in ONE packed
    # reduction: bits 0-17 accumulate killed*idx (<= 361*360 < 2^18), bits
    # 18+ the kill count.  The index sum equals the captured cell's flat
    # index exactly when one stone died — the only case ko consumes it
    # (gogame.py:72-75).
    if "capsum" in _ABLATE:
        num_captured = jnp.zeros((b,), jnp.int32)
        ko_flat = jnp.zeros((b,), jnp.int32)
    else:
        kill_word = jnp.where(killed, cell_idx + (1 << 18), 0)
        kill_sum = jnp.sum(kill_word.reshape(b, -1), axis=1, dtype=jnp.int32)
        num_captured = kill_sum >> 18
        ko_flat = kill_sum & ((1 << 18) - 1)

    # Simple ko: exactly one stone captured and the move was surrounded.
    ko_active = (num_captured == 1) & surrounded_pre
    if "bundle" in _ABLATE:
        one_lib, multi_lib, only_mover, only_opp = mover | opp, empty, empty, empty
        atari_enc = jnp.zeros((b, n, n), jnp.int16)
    else:
        one_lib, multi_lib, only_mover, only_opp, atari_enc = flood_bundle(
            mover, opp, n
        )
    if "areas" in _ABLATE:
        mover_area = opp_area = jnp.zeros((b,), jnp.int32)
    else:
        # both Trump-Taylor areas in one packed reduction (area <= 361 < 2^10)
        area_word = (
            jnp.where(mover | only_mover, jnp.int32(1 << 10), 0)
            | jnp.where(opp | only_opp, jnp.int32(1), 0)
        )
        area_sum = jnp.sum(area_word.reshape(b, -1), axis=1, dtype=jnp.int32)
        mover_area = area_sum >> 10
        opp_area = area_sum & ((1 << 10) - 1)
    black_area = jnp.where(mover_is_white, opp_area, mover_area)
    white_area = jnp.where(mover_is_white, mover_area, opp_area)

    white_to_move_next = jnp.where(frozen, white_to_move, ~white_to_move)
    if "invd" in _ABLATE:
        invd = all_pieces
        ko_surr_next = jnp.zeros_like(black)
    else:
        # One packed uint8 dilation replaces four bool neighbor_or's plus
        # the edge-as-wall surround count (state_utils.py:64-82's algebra,
        # bit-exactly).  Bits: 0 atari_mover, 1 multi_mover, 2 atari_opp,
        # 3 multi_opp, 4 empty.  The reference's ``convolve(all_pieces,
        # cross, cval=1) == 4`` test is equivalent to "no in-bounds
        # neighbor is empty", i.e. bit 4 of the zero-filled OR-dilation is
        # clear — an AND-dilation with edges-true by De Morgan.
        z8 = jnp.uint8(0)
        cls = jnp.where(one_lib, jnp.uint8(1), jnp.where(multi_lib, jnp.uint8(2), z8))
        packed_cls = jnp.where(
            mover, cls, jnp.where(opp, cls << 2, jnp.uint8(16))
        )
        # bits 5/6 feed next step's carried ko map: set on NON-mover /
        # NON-opp cells, so a cleared dilated bit means "every in-bounds
        # neighbor is a mover / opp stone" (edges contribute nothing,
        # matching the reference's in-bounds-only neighbor probe).
        packed_cls = (
            packed_cls
            | jnp.where(mover, z8, jnp.uint8(32))
            | jnp.where(opp, z8, jnp.uint8(64))
        )
        dil = (
            shift(packed_cls, 1, 0, z8)
            | shift(packed_cls, -1, 0, z8)
            | shift(packed_cls, 0, 1, z8)
            | shift(packed_cls, 0, -1, z8)
        )
        possible = empty & ((dil & jnp.uint8(6)) != 0)   # nb multi_mover|atari_opp
        definite = (dil & jnp.uint8(9)) != 0             # nb atari_mover|multi_opp
        surrounded_cells = (dil & jnp.uint8(16)) == 0
        invd = all_pieces | (possible & ~definite & surrounded_cells)
        ko_point = (cell_idx == ko_flat[:, None, None]) & ko_active[:, None, None]
        invd = invd | ko_point
        all_nb_mover = (dil & jnp.uint8(32)) == 0
        all_nb_opp = (dil & jnp.uint8(64)) == 0
        miw = mover_is_white[:, None, None]
        all_nb_black = jnp.where(miw, all_nb_opp, all_nb_mover)
        all_nb_white = jnp.where(miw, all_nb_mover, all_nb_opp)
        # next step's opponent is black iff white moves next
        ko_surr_next = jnp.where(
            white_to_move_next[:, None, None], all_nb_black, all_nb_white
        )

    # Frozen envs (finished, or invalid action) pass through unchanged.
    new_ps = PlanesState(
        black=jnp.where(fz, black, jnp.where(wtm, opp, mover)),
        white=jnp.where(fz, white, jnp.where(wtm, mover, opp)),
        invd=jnp.where(fz, ps.invd, invd),
        white_to_move=white_to_move_next,
        prev_passed=jnp.where(frozen, prev_passed, is_pass),
        done=jnp.where(frozen, done, done | (prev_passed & is_pass)),
        # The bundle/dilation ran on the frozen-resolved board, so the atari
        # encoding and ko map describe exactly the state every env keeps.
        atari=None if ps.atari is None else atari_enc,
        ko_surr=None if ps.ko_surr is None else ko_surr_next,
    )
    info = StepInfo(
        invalid_action=invalid_action,
        was_done=done,
        num_captured=jnp.where(frozen, 0, num_captured),
        black_area=black_area,
        white_area=white_area,
    )
    return new_ps, info


def step_states(states: jax.Array, actions: jax.Array):
    """Apply one move per env.  ``states`` int8 (B,6,N,N), ``actions`` (B,).

    Actions are flat ints in [0, N*N]; N*N means pass.  Returns
    ``(new_states, StepInfo)``.  Envs that are already done, or whose action
    is invalid, pass through unchanged and are flagged.
    """
    ps, info = step_planes(planes_from_states(states), actions)
    return states_from_planes(ps, states.dtype), info
