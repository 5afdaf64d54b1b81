"""Rules-scenario tests (illegal-move side), porting every case of the
reference's test_invalid_moves.py (/root/reference/gym_go/tests/)."""

import random

import numpy as np
import pytest

from gymgo_tpu import govars
from gymgo_tpu.env import GoEnv


@pytest.fixture
def env():
    e = GoEnv(size=7, reward_method="real", backend="jax")
    e.reset()
    return e


def play(env, moves):
    out = None
    for move in moves:
        out = env.step(move)
    return out


def test_out_of_bounds_action(env):
    with pytest.raises(Exception):
        env.step((-1, 0))
    with pytest.raises(Exception):
        env.step((0, 100))


def test_invalid_occupied_moves(env):
    for _ in range(8):
        env.reset()
        row = random.randint(0, 6)
        col = random.randint(0, 6)
        state, *_ = env.step((row, col))
        assert np.count_nonzero(state[govars.INVD_CHNL]) == 1
        assert state[govars.INVD_CHNL, row, col] == 1
        with pytest.raises(Exception):
            env.step((row, col))


def test_invalid_ko_protection_moves(env):
    state, *_ = play(env, [(0, 1), (0, 2), (1, 0), (1, 3), (2, 1), (2, 2), (1, 2), (1, 1)])
    assert np.count_nonzero(state[govars.INVD_CHNL]) == 8
    assert np.count_nonzero(state[govars.INVD_CHNL] == 1) == 8
    assert state[govars.INVD_CHNL, 1, 2] == 1
    assert state[govars.BLACK, 1, 2] == 0
    assert state[govars.WHITE, 1, 2] == 0

    with pytest.raises(Exception):
        env.step((1, 2))

    # Ko protection expires after one ply.
    env.step((6, 6))
    state, *_ = env.step(None)
    assert np.count_nonzero(state[govars.INVD_CHNL]) == 8
    assert state[govars.INVD_CHNL, 1, 2] == 0


def test_invalid_ko_wall_protection_moves(env):
    state, *_ = play(env, [(1, 0), (0, 0), None, (1, 1), None, (0, 2), (0, 1)])
    assert np.count_nonzero(state[govars.INVD_CHNL]) == 5
    assert np.count_nonzero(state[govars.INVD_CHNL] == 1) == 5
    assert state[govars.INVD_CHNL, 0, 0] == 1
    assert state[govars.BLACK, 0, 0] == 0
    assert state[govars.WHITE, 0, 0] == 0

    with pytest.raises(Exception):
        env.step((0, 0))

    env.step((6, 6))
    state, *_ = env.step(None)
    assert np.count_nonzero(state[govars.INVD_CHNL]) == 5
    assert state[govars.INVD_CHNL, 0, 0] == 0


def test_invalid_no_liberty_move(env):
    state, *_ = play(env, [(0, 1), (0, 2), (1, 0), (1, 4), (2, 1), (2, 2), (1, 2)])
    assert np.count_nonzero(state[govars.INVD_CHNL]) == 9
    assert np.count_nonzero(state[govars.INVD_CHNL] == 1) == 9
    assert state[govars.INVD_CHNL, 1, 1] == 1
    assert state[govars.INVD_CHNL, 0, 0] == 1
    assert state[govars.BLACK, 1, 1] == 0
    assert state[govars.WHITE, 1, 1] == 0
    with pytest.raises(Exception):
        env.step((1, 1))


def test_invalid_game_already_over_move(env):
    env.step(None)
    env.step(None)
    with pytest.raises(Exception):
        env.step(None)

    env.reset()
    env.step(None)
    env.step(None)
    with pytest.raises(Exception):
        env.step((0, 0))


def test_small_suicide():
    env = GoEnv(size=3, reward_method="real", backend="jax")
    env.reset()
    play(env, [6, 7, 8, 5, 4, 8, 0, 1])
    with pytest.raises(Exception):
        env.step(3)


def test_invalid_after_capture():
    env = GoEnv(size=3, reward_method="real", backend="jax")
    env.reset()
    play(env, [0, 8, 6, 4, 1, 2, 3, 7])
    with pytest.raises(Exception):
        env.step(5)


def test_cannot_capture_groups_with_multiple_holes(env):
    play(
        env,
        [(1, 1), (0, 1), (1, 2), (0, 2), (1, 3), (0, 3), (1, 4), (0, 4), (1, 5),
         (0, 5), (2, 5), (1, 6), (3, 5), (2, 6), (3, 4), (3, 6), (3, 3), (4, 5),
         (2, 3), (4, 4), (3, 2), (4, 3), (3, 1), (4, 2), (2, 1), (4, 1), None,
         (3, 0), None, (2, 0), None, (1, 0)],
    )
    env.step(None)
    with pytest.raises(Exception):
        env.step((2, 2))
