"""Unit tests for the GUI's pure geometry (gymgo_tpu.utils.gui_math).

pyglet is absent in CI, so the window itself can't run; these pin the
layout formulas and the mouse->intersection mapping against the reference's
(/root/reference/gym_go/envs/go_env.py:169-224, rendering.py:85-97),
including the board->screen transposition quirk (SURVEY.md Q11) and its
self-cancellation on the click path.
"""

import numpy as np
import pytest

from gymgo_tpu.utils import gui_math


def ref_layout(screen_w, screen_h, size):
    """The reference's formulas, verbatim (go_env.py:169-186)."""
    window_width = int(min(screen_w, screen_h) * 2 / 3)
    window_height = int(window_width * 1.2)
    lower = window_width * 0.075
    board = window_width * 0.85
    upper = board + lower
    delta = board / (size - 1)
    piece_r = delta / 3.3
    return window_width, window_height, lower, board, upper, delta, piece_r


@pytest.mark.parametrize("screen", [(1920, 1080), (1280, 1024), (800, 600)])
@pytest.mark.parametrize("size", [7, 9, 19])
def test_layout_matches_reference_formulas(screen, size):
    lay = gui_math.board_layout(*screen, size)
    assert tuple(lay) == ref_layout(*screen, size)


@pytest.mark.parametrize("size", [7, 19])
def test_click_exact_intersections_round_trip(size):
    """Clicking the exact center of stone (i, j) yields action (i, j): the
    draw transposition (rendering.py:90,96) and the click handler's
    (x_coord, y_coord) ordering (go_env.py:213-224) cancel."""
    lay = gui_math.board_layout(1920, 1080, size)
    for i in range(size):
        for j in range(size):
            x, y = gui_math.stone_screen_pos(i, j, lay.lower_grid_coord, lay.delta)
            assert gui_math.mouse_to_intersection(
                x, y, lay.lower_grid_coord, lay.delta) == (i, j)


def test_click_rounds_to_nearest_intersection():
    lay = gui_math.board_layout(1920, 1080, 9)
    x, y = gui_math.stone_screen_pos(3, 5, lay.lower_grid_coord, lay.delta)
    for dx in (-0.49, 0.0, 0.49):
        for dy in (-0.49, 0.0, 0.49):
            got = gui_math.mouse_to_intersection(
                x + dx * lay.delta, y + dy * lay.delta,
                lay.lower_grid_coord, lay.delta)
            assert got == (3, 5)


def test_transposition_quirk_is_present():
    """Board row index drives screen X (not Y) — the reference's Q11.  A
    'fixed' (row -> Y) mapping would break click parity with the reference."""
    lay = gui_math.board_layout(1920, 1080, 9)
    x, y = gui_math.stone_screen_pos(2, 6, lay.lower_grid_coord, lay.delta)
    assert x == lay.lower_grid_coord + 2 * lay.delta
    assert y == lay.lower_grid_coord + 6 * lay.delta


def test_offgrid_click_is_not_clamped():
    """Clicks outside the grid produce out-of-range coordinates (the env's
    step() raises on them) — the reference does not clamp (go_env.py:213-218)."""
    lay = gui_math.board_layout(1920, 1080, 9)
    # window origin: left of / below the first line by ~0.7*delta -> (-1, -1)
    got = gui_math.mouse_to_intersection(0.0, 0.0, lay.lower_grid_coord, lay.delta)
    assert got == (-1, -1)
    # far beyond the top-right corner
    far = gui_math.mouse_to_intersection(
        lay.upper_grid_coord + 5 * lay.delta, lay.upper_grid_coord,
        lay.lower_grid_coord, lay.delta)
    assert far[0] >= 9


def test_grid_line_offsets_span_board():
    lay = gui_math.board_layout(1280, 1024, 19)
    offs = gui_math.grid_line_offsets(19, lay.lower_grid_coord, lay.delta)
    assert len(offs) == 19
    np.testing.assert_allclose(offs[0], lay.lower_grid_coord)
    np.testing.assert_allclose(offs[-1], lay.upper_grid_coord)
    np.testing.assert_allclose(np.diff(offs), lay.delta)


def test_action_tuple_feeds_env_step():
    """End-to-end minus the window: a synthetic click on an empty
    intersection steps the env at exactly that (row, col)."""
    from gymgo_tpu.env.go_env import GoEnv

    env = GoEnv(size=7)
    env.reset()
    lay = gui_math.board_layout(1920, 1080, 7)
    x, y = gui_math.stone_screen_pos(4, 2, lay.lower_grid_coord, lay.delta)
    action = gui_math.mouse_to_intersection(x, y, lay.lower_grid_coord, lay.delta)
    obs, _, _, _ = env.step(action)
    assert obs[0, 4, 2] == 1  # black stone landed at (row 4, col 2)
