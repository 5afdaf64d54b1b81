"""Reference-compatible functional Go API ("low level API"), numpy in/out.

This module mirrors the public surface of the reference's ``gym_go.gogame``
(/root/reference/gym_go/gogame.py) function-for-function, backed by the
jitted TPU kernels in ``gymgo_tpu.core``.  States cross this boundary as
float64 0/1 arrays (the reference's dtype, gogame.py:24) and live on device
as int8.

Behavioral divergences (deliberate, see SURVEY.md §2.6):
  * batch_next_states applies per-env single-state semantics; the reference's
    batch capture-misalignment bug (Q1, state_utils.py:183-211) is not
    reproduced.
  * next_state on a finished game is a frozen no-op here (under jit we cannot
    raise data-dependently); the reference's GoEnv guards this path anyway
    (go_env.py:54).
Invalid moves raise AssertionError exactly like the reference (gogame.py:59).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from gymgo_tpu import govars
from gymgo_tpu.core import actions as _actions
from gymgo_tpu.core import score as _score
from gymgo_tpu.core import step as _step
from gymgo_tpu.core import transform as _transform
from gymgo_tpu.utils import render as _render

_OUT_DTYPE = np.float64


# --------------------------------------------------------------------------
# jitted kernels (cached per input shape)
# --------------------------------------------------------------------------

_step_states = jax.jit(_step.step_states)
_batch_canonical = jax.jit(_transform.batch_canonical_form)
_children_jit = jax.jit(_actions.children, static_argnames=("canonical",))
_areas_jit = jax.jit(_score.areas)
_num_liberties_jit = jax.jit(_score.num_liberties)
_liberties_jit = jax.jit(_score.liberties)


def _to_device(state) -> jax.Array:
    return jnp.asarray(np.asarray(state), dtype=jnp.int8)


def _to_host(state) -> np.ndarray:
    return np.asarray(state, dtype=_OUT_DTYPE)


# --------------------------------------------------------------------------
# state constructors (gogame.py:22-31)
# --------------------------------------------------------------------------

def init_state(size):
    return np.zeros((govars.NUM_CHNLS, size, size), dtype=_OUT_DTYPE)


def batch_init_state(batch_size, board_size):
    return np.zeros(
        (batch_size, govars.NUM_CHNLS, board_size, board_size), dtype=_OUT_DTYPE
    )


# --------------------------------------------------------------------------
# transitions (gogame.py:34-150)
# --------------------------------------------------------------------------

def next_state(state, action1d, canonical=False):
    out = batch_next_states(
        np.asarray(state)[None], np.asarray([action1d]), canonical
    )
    return out[0]


def _next_state_with_areas(state, action1d):
    """Internal (GoEnv fast path): like :func:`next_state` but also returns
    the step's own fused Trump-Taylor areas ``(black, white)`` so the
    heuristic/real reward does not pay a second device round trip to
    recompute what the kernel already produced (the step computes areas
    for free — core/step.py fused claim bits)."""
    dev = _to_device(np.asarray(state)[None])
    acts = jnp.asarray(np.asarray([action1d]), dtype=jnp.int32)
    new_states, info = _step_states(dev, acts)
    bad = np.asarray(info.invalid_action)
    assert not bad.any(), ("Invalid move", np.nonzero(bad)[0].tolist())
    areas = (int(np.asarray(info.black_area)[0]),
             int(np.asarray(info.white_area)[0]))
    return _to_host(new_states)[0], areas


def batch_next_states(batch_states, batch_action1d, canonical=False):
    dev = _to_device(batch_states)
    acts = jnp.asarray(np.asarray(batch_action1d), dtype=jnp.int32)
    new_states, info = _step_states(dev, acts)
    bad = np.asarray(info.invalid_action)
    assert not bad.any(), ("Invalid move", np.nonzero(bad)[0].tolist())
    if canonical:
        new_states = _batch_canonical(new_states)
    return _to_host(new_states)


# --------------------------------------------------------------------------
# move masks (gogame.py:153-172)
# --------------------------------------------------------------------------

def invalid_moves(state):
    # All moves are valid once the game is over (gogame.py:155-156).
    if game_ended(state):
        return np.zeros(action_size(state))
    return np.append(np.asarray(state)[govars.INVD_CHNL].flatten(), 0)


def valid_moves(state):
    return 1 - invalid_moves(state)


def batch_invalid_moves(batch_state):
    # Reference batch variant has no game-ended branch (gogame.py:164-168).
    batch_state = np.asarray(batch_state)
    n = len(batch_state)
    flat = batch_state[:, govars.INVD_CHNL].reshape(n, -1)
    return np.append(flat, np.zeros((n, 1)), axis=1)


def batch_valid_moves(batch_state):
    return 1 - batch_invalid_moves(batch_state)


# --------------------------------------------------------------------------
# children (gogame.py:175-186)
# --------------------------------------------------------------------------

def children(state, canonical=False, padded=True):
    dev = _to_device(state)
    out = _to_host(_children_jit(dev, canonical=bool(canonical)))
    if not padded:
        valid = valid_moves(state)
        out = out[np.nonzero(valid)]
    return out


# --------------------------------------------------------------------------
# scalar queries (gogame.py:189-250)
# --------------------------------------------------------------------------

def action_size(state=None, board_size: int = None):
    if state is not None:
        m, n = np.asarray(state).shape[1:]
    elif board_size is not None:
        m, n = board_size, board_size
    else:
        raise RuntimeError("No argument passed")
    return m * n + 1


def prev_player_passed(state):
    return np.max(np.asarray(state)[govars.PASS_CHNL] == 1) == 1


def batch_prev_player_passed(batch_state):
    return np.max(np.asarray(batch_state)[:, govars.PASS_CHNL], axis=(1, 2)) == 1


def game_ended(state):
    m, n = np.asarray(state).shape[1:]
    return int(
        np.count_nonzero(np.asarray(state)[govars.DONE_CHNL] == 1) == m * n
    )


def batch_game_ended(batch_state):
    return np.max(np.asarray(batch_state)[:, govars.DONE_CHNL], axis=(1, 2))


def turn(state):
    return int(np.max(np.asarray(state)[govars.TURN_CHNL]))


def batch_turn(batch_state):
    return np.max(np.asarray(batch_state)[:, govars.TURN_CHNL], axis=(1, 2)).astype(
        int
    )


# --------------------------------------------------------------------------
# scoring (gogame.py:225-310)
# --------------------------------------------------------------------------

def winning(state, komi=0):
    black_area, white_area = areas(state)
    return np.sign(black_area - white_area - komi)


def batch_winning(state, komi=0):
    batch_black, batch_white = batch_areas(state)
    return np.sign(batch_black - batch_white - komi)


def areas(state):
    ba, wa = _areas_jit(_to_device(state)[None])
    return float(ba[0]), float(wa[0])


def batch_areas(batch_state):
    ba, wa = _areas_jit(_to_device(batch_state))
    return np.asarray(ba, _OUT_DTYPE), np.asarray(wa, _OUT_DTYPE)


def liberties(state):
    bl, wl = _liberties_jit(_to_device(state)[None])
    return np.asarray(bl[0]), np.asarray(wl[0])


def num_liberties(state):
    bl, wl = _num_liberties_jit(_to_device(state)[None])
    return int(bl[0]), int(wl[0])


# --------------------------------------------------------------------------
# canonical form & symmetries (gogame.py:313-382)
# --------------------------------------------------------------------------

def canonical_form(state):
    return _to_host(_batch_canonical(_to_device(state)[None])[0])


def batch_canonical_form(batch_state):
    return _to_host(_batch_canonical(_to_device(batch_state)))


def random_symmetry(image):
    """One of the 8 dihedral symmetries, drawn from global ``np.random`` for
    reference-parity with gogame.py:340-358 (production code should use
    ``core.transform.random_symmetry`` with an explicit key)."""
    orientation = np.random.randint(0, 8)
    image = np.asarray(image)
    if (orientation >> 0) % 2:
        image = np.flip(image, 2)
    if (orientation >> 1) % 2:
        image = np.flip(image, 1)
    if (orientation >> 2) % 2:
        image = np.rot90(image, axes=(1, 2))
    return image


def all_symmetries(image):
    image = np.asarray(image)
    out = []
    for i in range(8):
        x = image
        if (i >> 0) % 2:
            x = np.flip(x, 2)
        if (i >> 1) % 2:
            x = np.flip(x, 1)
        if (i >> 2) % 2:
            x = np.rot90(x, axes=(1, 2))
        out.append(x)
    return out


# --------------------------------------------------------------------------
# random policies (gogame.py:385-404) — host-side, global np.random, so that
# fixed-seed action streams match the reference driver exactly (SURVEY §7.5).
# --------------------------------------------------------------------------

def random_weighted_action(move_weights):
    move_weights = np.asarray(move_weights, dtype=np.float64)
    norm = np.sum(np.abs(move_weights))
    probs = move_weights / norm
    return np.random.choice(np.arange(len(probs)), p=probs)


def random_action(state):
    invalid = np.asarray(state)[govars.INVD_CHNL].flatten()
    invalid = np.append(invalid, 0)
    return random_weighted_action(1 - invalid)


# --------------------------------------------------------------------------
# terminal renderer (gogame.py:407-468)
# --------------------------------------------------------------------------

def str(state):  # noqa: A001 - shadows builtin, mirroring the reference API
    state = np.asarray(state)
    black_area, white_area = areas(state)
    return _render.board_str(
        state,
        black_area=int(black_area),
        white_area=int(white_area),
        done=bool(game_ended(state)),
        passed=bool(prev_player_passed(state)),
        turn=turn(state),
    )
