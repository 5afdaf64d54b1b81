"""Rules-scenario tests (legal-move side), porting every case of the
reference's test_valid_moves.py (/root/reference/gym_go/tests/) — scripted
move sequences with exact channel assertions."""

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


def test_simple_valid_moves(env):
    for i in range(7):
        _, _, done, _ = env.step((0, i))
        assert not done
    env.reset()
    for i in range(7):
        _, _, done, _ = env.step((i, i))
        assert not done
    env.reset()
    for i in range(7):
        _, _, done, _ = env.step((i, 0))
        assert not done


def test_valid_no_liberty_move(env):
    # Black plays into a point with no immediate liberties but which
    # captures; see reference board diagram (test_valid_moves.py:35-63).
    state, *_ = play(env, [(0, 1), (0, 2), (1, 0), (1, 3), (2, 1), (2, 2), (1, 2), (1, 1)])
    assert np.count_nonzero(state[govars.BLACK]) == 3
    assert np.count_nonzero(state[govars.WHITE]) == 4
    assert np.count_nonzero(state[govars.WHITE] == 1) == 4


def test_valid_no_liberty_capture(env):
    state, *_ = play(env, [(0, 0), (0, 2), (0, 3), (1, 1), (1, 2), (1, 0)])
    assert np.count_nonzero(state[govars.INVD_CHNL]) == 6
    assert np.count_nonzero(state[govars.INVD_CHNL] == 1) == 6
    assert state[govars.INVD_CHNL, 0, 1] == 0
    assert state[govars.BLACK, 0, 1] == 0
    assert state[govars.WHITE, 0, 1] == 0

    state, *_ = env.step((0, 1))
    assert np.count_nonzero(state[govars.WHITE]) == 2
    assert np.count_nonzero(state[govars.BLACK]) == 4
    assert np.count_nonzero(state[govars.BLACK] == 1) == 4


def test_simple_capture(env):
    state, *_ = play(env, [(0, 1), (1, 1), (1, 0), None, (1, 2), None, (2, 1)])
    assert np.count_nonzero(state[govars.WHITE]) == 0
    assert np.count_nonzero(state[govars.BLACK]) == 4
    assert np.count_nonzero(state[govars.BLACK] == 1) == 4


def test_large_group_capture(env):
    state, *_ = play(
        env,
        [(2, 2), (1, 2), (2, 3), (1, 3), (2, 4), (1, 4), (3, 4), (2, 5), (3, 3),
         (3, 5), (3, 2), (4, 4), None, (4, 3), None, (4, 2), None, (3, 1), None,
         (2, 1)],
    )
    assert np.count_nonzero(state[govars.BLACK]) == 0
    assert np.count_nonzero(state[govars.WHITE]) == 10
    assert np.count_nonzero(state[govars.WHITE] == 1) == 10


def test_large_group_suicide(env):
    state, *_ = play(env, [(4, 0), (6, 0), (4, 1), (5, 0), (5, 2), (5, 1), (6, 2)])
    assert np.count_nonzero(state[govars.INVD_CHNL]) == 8
    assert np.count_nonzero(state[govars.INVD_CHNL] == 1) == 8
    assert state[govars.BLACK, 6, 1] == 0
    assert state[govars.WHITE, 6, 1] == 0
    with pytest.raises(Exception):
        env.step((6, 1))


def test_group_edge_capture(env):
    state, *_ = play(env, [(0, 0), (0, 2), (0, 1), (1, 2), (1, 1), (2, 1), (1, 0), (2, 0)])
    assert np.count_nonzero(state[govars.BLACK]) == 0
    assert np.count_nonzero(state[govars.WHITE]) == 4
    assert np.count_nonzero(state[govars.WHITE] == 1) == 4


def test_group_kill_no_ko_protection(env):
    # Killing a multi-stone group must NOT create ko protection
    # (reference regression test, test_valid_moves.py:227-261).
    state, *_ = play(
        env,
        [(0, 5), (0, 4), (1, 5), (1, 4), (2, 5), (2, 4), (2, 6), (3, 5), None,
         (3, 6), None, (1, 6), (0, 6)],
    )
    assert state[govars.INVD_CHNL, 1, 6] == 0
    state, *_ = env.step((1, 6))
    assert state[govars.BLACK].sum() == 0
    assert state[govars.WHITE].sum() == 6
