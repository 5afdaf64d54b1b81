"""On-device scoring: Trump-Taylor areas, winner sign, liberty queries.

Mirrors /root/reference/gym_go/gogame.py:225-310 (areas / winning) and
:253-272 (liberties), replacing the per-empty-region label loop with one
two-bit OR-flood: every cell of an empty region learns whether the region
touches black and/or white; a region counts for a color iff it touches only
that color — exactly the reference's dilate-and-claim test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gymgo_tpu import govars
from gymgo_tpu.core.flood import flood_or_best as flood_or, neighbor_or

__all__ = ["areas", "areas_planes", "winning", "winning_planes", "liberties", "num_liberties"]


def areas_planes(black: jax.Array, white: jax.Array):
    """Trump-Taylor area score from color planes ((B,N,N) bool each)."""
    b = black.shape[0]
    empty = ~(black | white)

    touch = jnp.where(empty & neighbor_or(black), jnp.uint8(1), jnp.uint8(0))
    touch = touch | jnp.where(empty & neighbor_or(white), jnp.uint8(2), jnp.uint8(0))
    touch = flood_or(touch, empty)
    only_black = empty & (touch == 1)
    only_white = empty & (touch == 2)

    black_area = jnp.sum((black | only_black).reshape(b, -1), axis=1, dtype=jnp.int32)
    white_area = jnp.sum((white | only_white).reshape(b, -1), axis=1, dtype=jnp.int32)
    return black_area, white_area


def areas(states: jax.Array):
    """Batched Trump-Taylor area score.  Returns (black_area, white_area) int32 (B,)."""
    return areas_planes(
        states[:, govars.BLACK].astype(jnp.bool_),
        states[:, govars.WHITE].astype(jnp.bool_),
    )


def winning_planes(black, white, komi: float = 0.0):
    ba, wa = areas_planes(black, white)
    return jnp.sign(ba.astype(jnp.float32) - wa.astype(jnp.float32) - komi)


def winning(states: jax.Array, komi: float = 0.0):
    """sign(black_area - white_area - komi) per env, from black's perspective
    (gogame.py:225-230); valid mid-game as well as at game end."""
    black_area, white_area = areas(states)
    diff = black_area.astype(jnp.float32) - white_area.astype(jnp.float32) - komi
    return jnp.sign(diff)


def liberties(states: jax.Array):
    """Per-color aggregate liberty masks (empty cells adjacent to that color).

    Note this is the reference's per-color — not per-group — definition
    (gogame.py:253-264): a point adjacent to both colors counts for both.
    """
    black = states[:, govars.BLACK].astype(jnp.bool_)
    white = states[:, govars.WHITE].astype(jnp.bool_)
    empty = ~(black | white)
    return empty & neighbor_or(black), empty & neighbor_or(white)


def num_liberties(states: jax.Array):
    """Popcounts of the per-color liberty masks (gogame.py:267-272)."""
    b = states.shape[0]
    black_libs, white_libs = liberties(states)
    return (
        jnp.sum(black_libs.reshape(b, -1), axis=1, dtype=jnp.int32),
        jnp.sum(white_libs.reshape(b, -1), axis=1, dtype=jnp.int32),
    )
