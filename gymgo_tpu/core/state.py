"""State constructors and accessors for the batched 6-channel Go state.

The on-device representation is ``int8`` with 0/1 values, shaped
``(B, NUM_CHNLS, N, N)`` — the exact channel layout of the reference
(/root/reference/gym_go/gogame.py:7-31), chosen so states round-trip between
the two engines by a dtype cast alone.  TURN/PASS/DONE planes are kept
uniform (whole-plane indicators), so scalar reads use element [0, 0].
"""

from __future__ import annotations

import jax.numpy as jnp

from gymgo_tpu import govars

STATE_DTYPE = jnp.int8


def init_state(size: int, dtype=STATE_DTYPE):
    """Fresh single-game state ``(NUM_CHNLS, N, N)`` of zeros."""
    return jnp.zeros((govars.NUM_CHNLS, size, size), dtype=dtype)


def batch_init_state(batch_size: int, board_size: int, dtype=STATE_DTYPE):
    """Fresh batch of states ``(B, NUM_CHNLS, N, N)`` of zeros."""
    return jnp.zeros(
        (batch_size, govars.NUM_CHNLS, board_size, board_size), dtype=dtype
    )


def board_size(states) -> int:
    return states.shape[-1]


def black(states):
    return states[..., govars.BLACK, :, :].astype(jnp.bool_)


def white(states):
    return states[..., govars.WHITE, :, :].astype(jnp.bool_)


def invalid_channel(states):
    return states[..., govars.INVD_CHNL, :, :].astype(jnp.bool_)


def turn(states):
    """0 = black to move, 1 = white to move; shape = batch dims."""
    return states[..., govars.TURN_CHNL, 0, 0].astype(jnp.int32)


def prev_player_passed(states):
    return states[..., govars.PASS_CHNL, 0, 0].astype(jnp.bool_)


def game_ended(states):
    return states[..., govars.DONE_CHNL, 0, 0].astype(jnp.bool_)


def action_size(board_size: int) -> int:
    return board_size * board_size + 1
