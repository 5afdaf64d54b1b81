"""GTP engine tests: protocol framing, command coverage, legality, scoring,
and a full random-vs-random game driven purely through the protocol."""

import pytest
import numpy as np

from gymgo_tpu.utils.gtp import GTPEngine, _action_to_vertex, _vertex_to_action


def _ok(resp):
    assert resp is not None and resp.startswith("=") and resp.endswith("\n\n"), resp
    return resp[1:].strip()


def _err(resp):
    assert resp is not None and resp.startswith("?"), resp
    return resp[1:].strip()


def test_vertex_round_trip():
    for n in (5, 9, 19):
        for a in range(n * n + 1):
            v = _action_to_vertex(a, n)
            assert _vertex_to_action(v, n) == a
    # GTP skips the letter I
    assert _vertex_to_action("J1", 9) == 8 * 9 + 8
    assert _vertex_to_action("A1", 9) == 8 * 9
    assert _vertex_to_action("A9", 9) == 0


def test_protocol_basics():
    eng = GTPEngine(9, komi=5.5)
    assert _ok(eng.handle("protocol_version")[0]) == "2"
    assert _ok(eng.handle("name")[0]) == "gymgo_tpu"
    assert "genmove" in _ok(eng.handle("list_commands")[0]).split()
    assert _ok(eng.handle("known_command play")[0]) == "true"
    assert _ok(eng.handle("known_command frobnicate")[0]) == "false"
    # id echo
    resp, err, _ = eng.handle("7 name")
    assert resp.startswith("=7 ")
    resp, err, quit_ = eng.handle("quit")
    assert not err and quit_
    # comments and blank lines produce no response
    assert eng.handle("# a comment")[0] is None
    assert eng.handle("   ")[0] is None
    # unknown command is an error
    _err(eng.handle("frobnicate")[0])


def test_play_and_rules():
    eng = GTPEngine(5, komi=0.0)
    assert _ok(eng.handle("play b C3")[0]) == ""
    _err(eng.handle("play b C4")[0])  # out of turn
    _err(eng.handle("play w C3")[0])  # occupied
    _err(eng.handle("play w Z9")[0])  # bad vertex
    assert _ok(eng.handle("play w pass")[0]) == ""
    # undo restores the pass
    assert _ok(eng.handle("undo")[0]) == ""
    assert _ok(eng.handle("play w C4")[0]) == ""
    board = _ok(eng.handle("showboard")[0])
    assert "○" in board and "●" in board
    # boardsize change resets
    assert _ok(eng.handle("boardsize 7")[0]) == ""
    assert eng.n == 7
    _err(eng.handle("boardsize 25")[0])


def test_full_random_game_and_score():
    eng = GTPEngine(5, komi=2.5, seed=1)
    colors = ["b", "w"]
    done = False
    for ply in range(200):
        resp, err, _ = eng.handle(f"genmove {colors[ply % 2]}")
        assert not err
        if eng.state[5, 0, 0] != 0:  # DONE plane set
            done = True
            break
    assert done, "random game did not finish in 200 plies"
    score = _ok(eng.handle("final_score")[0])
    assert score[0] in "BW0", score
    if score != "0":
        float(score.split("+")[1])  # parses as a number


@pytest.mark.slow
def test_genmove_legality_stream():
    eng = GTPEngine(7, komi=0.0, seed=3)
    for ply in range(60):
        resp, err, _ = eng.handle(f"genmove {'b' if ply % 2 == 0 else 'w'}")
        assert not err, resp
        if eng.state[5, 0, 0] != 0:
            break
    # all moves were accepted by the engine itself (no illegal fallback);
    # cross-check the final position against the jax kernel by replaying
    from gymgo_tpu.core import step as _step
    import jax.numpy as jnp

    states = jnp.zeros((1, 6, 7, 7), jnp.int8)
    for a in eng.moves:
        states, info = _step.step_states(states, jnp.asarray([a]))
        assert not bool(info.invalid_action[0])
    np.testing.assert_array_equal(np.asarray(states[0]), eng.state)


def test_genmove_match_pass_rule():
    """genmove passes exactly when passing seals a win; never passes while
    board moves exist otherwise (match_pass_rule on; off is the class
    default so embedders' genmove_fn is never silently overridden)."""
    eng = GTPEngine(5, komi=0.0, seed=1, match_pass_rule=True)
    # black clearly ahead; white just passed -> black's pass ends a won game
    s = np.zeros((6, 5, 5), np.int8)
    s[0, :3, :] = 1
    s[4] = 1  # PASS_CHNL: previous move was a pass
    eng.state = s
    resp, err, _ = eng.handle("genmove b")
    assert not err and resp.strip().split()[-1] == "pass"

    # fresh board: the random fallback must never answer pass early
    eng2 = GTPEngine(5, komi=0.0, seed=1, match_pass_rule=True)
    for ply in range(6):
        resp, err, _ = eng2.handle(f"genmove {'b' if ply % 2 == 0 else 'w'}")
        assert not err
        assert resp.strip().split()[-1] != "pass"

    # --raw-pass behavior: rule disabled, mover's pass goes through
    eng3 = GTPEngine(5, komi=0.0, genmove_fn=lambda st: 25,
                     match_pass_rule=False)
    resp, err, _ = eng3.handle("genmove b")
    assert not err and resp.strip().split()[-1] == "pass"


@pytest.mark.slow
def test_puct_mover_tree_reuse():
    """PUCT genmove with cross-move subtree reuse: a full engine-vs-scripted
    dialogue, tree descending through both players' moves, invalidation on
    clear_board/undo, legality replay against the jax kernel."""
    import jax
    from gymgo_tpu.models import AZNet, AZNetConfig, init_params
    from gymgo_tpu.utils.gtp import PUCTMover

    n = 5
    netcfg = AZNetConfig(board_size=n, channels=8, blocks=1,
                         policy_channels=2, value_channels=2)
    net = AZNet(netcfg)
    params = init_params(jax.random.PRNGKey(0), netcfg)
    mover = PUCTMover(params, net.apply, simulations=8, komi=0.0, seed=1,
                      num_parallel=2)
    eng = GTPEngine(n, komi=0.0, genmove_fn=mover, seed=5)

    resp, err, _ = eng.handle("genmove b")
    assert not err
    assert mover._tree is not None  # tree stored and descended via on_move

    # opponent reply through `play` must also descend the stored tree
    import numpy as np
    legal = np.flatnonzero(eng.state[3].reshape(-1) == 0)
    from gymgo_tpu.utils.gtp import _action_to_vertex
    resp, err, _ = eng.handle(f"play w {_action_to_vertex(int(legal[0]), n)}")
    assert not err
    assert mover._tree is not None

    # a few more search moves exercise the warm path end-to-end
    for ply in range(4):
        color = "b" if ply % 2 == 0 else "w"
        resp, err, _ = eng.handle(f"genmove {color}")
        assert not err, resp
        if eng.state[5, 0, 0] != 0:
            break

    # undo and clear invalidate the carried tree
    eng.handle("undo")
    assert mover._tree is None
    eng.handle("genmove " + ("b" if eng.state[2, 0, 0] == 0 else "w"))
    assert mover._tree is not None
    eng.handle("clear_board")
    assert mover._tree is None


def test_loadsgf():
    """GTP loadsgf: position (with handicap setup) loads from file, board
    size and komi follow the record, optional move_number truncates."""
    import os

    from gymgo_tpu import govars

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "handicap_kgs_style.sgf")
    # engine starts at a different size; loadsgf must resize to the file
    eng = GTPEngine(19, komi=7.5, seed=0)
    _ok(eng.handle(f"loadsgf {path}")[0])
    assert eng.n == 9 and eng.komi == 0.5
    assert len(eng.moves) == 48
    assert eng.state[:2].sum() >= 2  # setup stones + surviving moves
    # play continues from the loaded position
    resp, err, _ = eng.handle(
        "genmove b" if eng._turn() == 0 else "genmove w")
    _ok(resp)

    # move_number: loadsgf plays the moves BEFORE it (GTP v2)
    eng2 = GTPEngine(9, komi=0.0, seed=0)
    _ok(eng2.handle(f"loadsgf {path} 5")[0])
    assert len(eng2.moves) == 4
    assert int(eng2.state[govars.BLACK].sum()) >= 2  # handicap stones live

    # a bad path is a clean GTP failure, not an exception
    resp, err, _ = eng2.handle("loadsgf /no/such/file.sgf")
    assert err and "cannot load file" in resp

    # loadsgf is advertised
    assert "loadsgf" in _ok(eng2.handle("list_commands")[0])

    # a multi-game collection file loads its FIRST game (one GTP board)
    cpath = os.path.join(os.path.dirname(__file__), "fixtures",
                         "collection_two_games.sgf")
    eng3 = GTPEngine(19, komi=0.0, seed=0)
    _ok(eng3.handle(f"loadsgf {cpath}")[0])
    assert eng3.n == 5 and eng3.komi == 0.5
    assert len(eng3.moves) == 5  # game 1's main line, variation pruned


def test_fixed_handicap():
    from gymgo_tpu import govars
    from gymgo_tpu.utils.gtp import fixed_handicap_points

    eng = GTPEngine(9, komi=0.0, seed=0)
    verts = _ok(eng.handle("fixed_handicap 4")[0]).split()
    assert len(verts) == 4
    assert int(eng.state[govars.BLACK].sum()) == 4
    assert eng._turn() == 1  # white moves first after handicap
    _ok(eng.handle("genmove w")[0])

    # occupied board refuses further handicap
    resp, err, _ = eng.handle("fixed_handicap 2")
    assert err and "board not empty" in resp
    # bad counts
    eng.handle("clear_board")
    assert eng.handle("fixed_handicap 1")[1]
    assert eng.handle("fixed_handicap 10")[1]
    # 5 stones on an odd board uses the center
    eng.handle("clear_board")
    _ok(eng.handle("fixed_handicap 5")[0])
    assert eng.state[govars.BLACK, 4, 4] == 1
    # 9-stone layout is the full star-point set at 19x19
    pts = fixed_handicap_points(19, 9)
    assert len(pts) == 9 and (9, 9) in pts and (3, 3) in pts \
        and (15, 15) in pts and (9, 3) in pts


def test_set_free_handicap():
    from gymgo_tpu import govars

    eng = GTPEngine(9, komi=0.0, seed=0)
    _ok(eng.handle("set_free_handicap C3 G7 E5")[0])
    assert int(eng.state[govars.BLACK].sum()) == 3
    assert eng._turn() == 1
    # duplicate vertex / pass rejected on a fresh board
    eng.handle("clear_board")
    assert eng.handle("set_free_handicap C3 C3")[1]
    assert eng.handle("set_free_handicap C3 pass")[1]
    assert eng.handle("set_free_handicap C3")[1]  # needs >= 2
