"""API/contract tests, porting every scenario of the reference's
test_basics.py (all 14 cases, /root/reference/gym_go/tests/test_basics.py)
to the TPU-backed GoEnv."""

import numpy as np
import pytest

from gymgo_tpu import govars
from gymgo_tpu.env import GoEnv


@pytest.fixture
def env():
    e = GoEnv(size=7, reward_method="real", backend="jax")
    e.reset()
    return e


def test_state(env):
    state = env.reset()
    assert isinstance(state, np.ndarray)
    assert state.shape[0] == govars.NUM_CHNLS


@pytest.mark.parametrize("size", [7, 13, 19])
def test_board_sizes(size):
    env = GoEnv(size=size, backend="jax")
    state = env.reset()
    assert state.shape[1] == size and state.shape[2] == size


def test_empty_board(env):
    assert np.count_nonzero(env.reset()) == 0


def test_reset(env):
    state, reward, done, info = env.step((0, 0))
    assert np.count_nonzero(state[[govars.BLACK, govars.WHITE, govars.INVD_CHNL]]) == 2
    assert np.count_nonzero(state) == 51
    state = env.reset()
    assert np.count_nonzero(state) == 0


def test_preserve_original_state(env):
    state = env.reset()
    original = np.copy(state)
    env.gogame.next_state(state, 0)
    assert (original == state).all()


def test_black_moves_first(env):
    state, *_ = env.step((0, 0))
    assert state[govars.BLACK, 0, 0] == 1
    assert state[govars.WHITE, 0, 0] == 0


def test_turns(env):
    for i in range(7):
        state, reward, done, info = env.step((i, 0))
        assert info["turn"] == (1 if i % 2 == 0 else 0)


def test_multiple_action_formats(env):
    for _ in range(10):
        action_1d = np.random.randint(50)
        action_2d = None if action_1d == 49 else (action_1d // 7, action_1d % 7)
        env.reset()
        state_from_1d, *_ = env.step(action_1d)
        env.reset()
        state_from_2d, *_ = env.step(action_2d)
        assert (state_from_1d == state_from_2d).all()


def test_passing(env):
    state, reward, done, info = env.step(None)
    assert np.count_nonzero(state[[govars.BLACK, govars.WHITE]]) == 0
    assert np.count_nonzero(state) == 98
    assert np.count_nonzero(state[govars.PASS_CHNL]) == 49
    assert np.count_nonzero(state[govars.PASS_CHNL] == 1) == 49
    assert info["turn"] == 1

    state, reward, done, info = env.step((0, 0))
    assert np.count_nonzero(state) == 2
    assert np.count_nonzero(state[govars.WHITE]) == 1
    assert np.count_nonzero(state[govars.PASS_CHNL]) == 0

    env.reset()
    state, reward, done, info = env.step((0, 0))
    assert np.count_nonzero(state) == 51
    assert np.count_nonzero(state[[govars.BLACK, govars.WHITE, govars.INVD_CHNL]]) == 2
    assert info["turn"] == 1

    state, reward, done, info = env.step(None)
    assert np.count_nonzero(state[[govars.BLACK, govars.WHITE, govars.INVD_CHNL]]) == 2
    assert info["turn"] == 0


def test_game_ends(env):
    state, reward, done, info = env.step(None)
    assert not done
    state, reward, done, info = env.step(None)
    assert done

    env.reset()
    state, reward, done, info = env.step((0, 0))
    assert not done
    state, reward, done, info = env.step(None)
    assert not done
    state, reward, done, info = env.step(None)
    assert done


def test_game_does_not_end_with_disjoint_passes(env):
    for action, expect_done in [(None, False), ((0, 0), False), (None, False)]:
        state, reward, done, info = env.step(action)
        assert done == expect_done


def test_num_liberties():
    env = GoEnv(size=7, backend="jax")
    env.reset()
    for step, libs in zip([(0, 0), (0, 1)], [(2, 0), (1, 2)]):
        state, *_ = env.step(step)
        assert env.gogame.num_liberties(state) == libs

    env.reset()
    steps = [(2, 1), None, (1, 2), None, (2, 3), None, (3, 2), None]
    libs = [(4, 0), (4, 0), (6, 0), (6, 0), (8, 0), (8, 0), (9, 0), (9, 0)]
    for step, expected in zip(steps, libs):
        state, *_ = env.step(step)
        assert env.gogame.num_liberties(state) == expected


def test_komi():
    env = GoEnv(size=7, komi=2.5, reward_method="real", backend="jax")

    # White wins the empty double-pass game on komi.
    env.step(None)
    state, reward, done, info = env.step(None)
    assert reward == -1

    env.reset()
    for a in [0, 2, 1, None]:
        env.step(a)
    state, reward, done, info = env.step(None)
    assert reward == -1

    env.reset()
    for a in [0, None, 1, None, 2, None]:
        env.step(a)
    state, reward, done, info = env.step(None)
    assert reward == 1


def test_children(env):
    for canonical in [False, True]:
        env.reset()
        for _ in range(20):
            env.step(env.uniform_random_action())
        state = env.state()
        children = env.children(canonical, padded=True)
        valid_moves = env.valid_moves()
        for a in range(len(valid_moves)):
            if valid_moves[a]:
                child = env.gogame.next_state(state, a, canonical)
                assert (children[a] == child).all()
            else:
                assert (children[a] == 0).all()


def test_real_reward():
    env = GoEnv(size=7, reward_method="real", backend="jax")

    state, reward, done, info = env.step((0, 0))
    assert reward == 0
    state, reward, done, info = env.step(None)
    assert reward == 0
    state, reward, done, info = env.step(None)
    assert reward == 1

    env.reset()
    for action, expected in [(None, 0), ((0, 0), 0), (None, 0), (None, -1)]:
        state, reward, done, info = env.step(action)
        assert reward == expected

    env.reset()
    state, reward, done, info = env.step(None)
    assert reward == 0
    state, reward, done, info = env.step(None)
    assert reward == 0  # tie


def test_heuristic_reward():
    env = GoEnv(size=7, reward_method="heuristic", backend="jax")

    for action, expected in [
        ((0, 0), 49),
        ((0, 1), 0),
        (None, 0),
        ((1, 0), -49),
        (None, -49),
        (None, -49),
    ]:
        state, reward, done, info = env.step(action)
        assert reward == expected

    env.reset()
    for action, expected in [((0, 0), 49), (None, 49), (None, 49)]:
        state, reward, done, info = env.step(action)
        assert reward == expected
