"""Auxiliary-subsystem tests: metrics counters, checkify debug stepping,
checkpoint/resume bit-exactness of interrupted rollouts."""

import jax
import jax.numpy as jnp
import numpy as np

from gymgo_tpu.config import EnvConfig
from gymgo_tpu.core.debug import checked_step
from gymgo_tpu.core.state import batch_init_state
from gymgo_tpu.env import BatchGoEnv
from gymgo_tpu.utils import checkpoint as ckpt
from gymgo_tpu.utils.metrics import format_metrics, init_metrics, update_metrics


def test_metrics_counters():
    cfg = EnvConfig(board_size=5, batch_size=3, auto_reset=True)
    env = BatchGoEnv(cfg)
    states = env.reset()
    m = init_metrics()
    p = cfg.pass_action
    # env0 double-passes to finish (tie on empty board), others play stones
    for acts in ([p, 0, 1], [p, 5, 6], [0, 7, 8]):
        states, res = env.step(states, jnp.asarray(acts))
        m = update_metrics(m, res)
    assert int(m.env_steps) == 9
    assert int(m.games_finished) == 1
    assert int(m.ties) == 1
    assert int(m.black_wins) == 0 and int(m.white_wins) == 0
    assert int(m.invalid_actions) == 0
    assert "games=1" in format_metrics(m)


def test_metrics_no_double_count_frozen():
    cfg = EnvConfig(board_size=5, batch_size=1, auto_reset=False)
    env = BatchGoEnv(cfg)
    states = env.reset()
    p = cfg.pass_action
    m = init_metrics()
    for acts in ([p], [p], [p], [p]):  # finishes at step 2, frozen after
        states, res = env.step(states, jnp.asarray(acts))
        m = update_metrics(m, res)
    assert int(m.games_finished) == 1


def test_checked_step_flags_invalid():
    states = batch_init_state(2, 5)
    err, (new_states, info) = checked_step(states, jnp.asarray([0, 3]))
    err.throw()  # no error on valid actions

    states2, _ = new_states, info
    err, _ = checked_step(states2, jnp.asarray([0, 1]))  # env0 repeats move 0
    try:
        err.throw()
        raised = False
    except Exception:
        raised = True
    assert raised


def test_resume_bit_exact(tmp_path):
    """checkpoint mid-rollout -> restore -> continue == uninterrupted run."""
    cfg = EnvConfig(board_size=7, batch_size=4, auto_reset=True)
    env = BatchGoEnv(cfg)
    key = jax.random.PRNGKey(9)
    k1, k2 = jax.random.split(key)

    states = env.reset()
    r_full_a = env.rollout(k1, states, 20)
    r_full_b = env.rollout(k2, r_full_a.final_states, 20)

    # interrupted: same first half, checkpoint, restore, second half
    states = env.reset()
    r_half = env.rollout(k1, states, 20)
    path = str(tmp_path / "resume.npz")
    tree = {"states": r_half.final_states, "key": k2}
    ckpt.save_npz(path, tree)
    restored = ckpt.restore_npz(path, tree)
    r_resumed = env.rollout(
        jnp.asarray(restored["key"]), jnp.asarray(restored["states"]), 20
    )
    np.testing.assert_array_equal(
        np.asarray(r_full_b.final_states), np.asarray(r_resumed.final_states)
    )
    np.testing.assert_array_equal(
        np.asarray(r_full_b.actions), np.asarray(r_resumed.actions)
    )


def test_orbax_checkpoint_roundtrip(tmp_path):
    tree = {
        "states": batch_init_state(4, 5),
        "key": jax.random.PRNGKey(1),
    }
    path = str(tmp_path / "orbax_ck")
    ckpt.save_orbax(path, tree)
    restored = ckpt.restore_orbax(path, tree)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sgf_export():
    from gymgo_tpu.utils import sgf

    s = sgf.game_to_sgf([0, 5, 25, 25], 5, komi=0.5, result="B+R")
    assert s.startswith("(;GM[1]FF[4]SZ[5]KM[0.5]")
    assert ";B[aa]" in s and ";W[ab]" in s  # (0,0) -> aa ; 5=(1,0) -> col a row b
    assert ";B[]" in s and ";W[]" in s  # passes
    assert s.endswith(")")

    cfg = EnvConfig(board_size=5, batch_size=2, auto_reset=True)
    env = BatchGoEnv(cfg)
    states = env.reset()
    r = env.rollout(jax.random.PRNGKey(0), states, 60)
    games = sgf.rollout_to_sgf_games(r.actions, r.dones, 5, env_index=0)
    for g in games:
        assert g.startswith("(;GM[1]") and g.endswith(")")


def test_sgf_import_roundtrip():
    """export -> parse -> replay reproduces the original final board."""
    import jax
    import numpy as np

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.env.batch_env import rollout
    from gymgo_tpu.utils import sgf

    cfg = EnvConfig(board_size=5, batch_size=8, auto_reset=True)
    r = rollout(jax.random.PRNGKey(2), batch_init_state(8, 5), 120, cfg)
    games = sgf.rollout_to_sgf_games(r.actions, r.dones, 5, komi=0.5)
    assert games, "no completed game in 120 steps"
    game, states = sgf.replay_sgf(games[0])
    assert game.board_size == 5 and game.komi == 0.5
    parsed = sgf.parse_sgf(games[0])
    assert [a for _, a in parsed.moves] == [a for _, a in game.moves]
    # the replayed game must END exactly when the record does (double pass)
    final = states[-1]
    assert final[5].sum() == 25  # DONE plane fully set
    # colors alternate starting with black
    assert [c for c, _ in game.moves][:2] == ["B", "W"]


def test_sgf_import_features():
    from gymgo_tpu.utils import sgf

    # variations: main line is the first branch
    s = "(;GM[1]SZ[5]KM[6.5];B[aa](;W[bb];B[cc])(;W[dd]))"
    g = sgf.parse_sgf(s)
    assert g.komi == 6.5
    assert g.moves == [("B", 0), ("W", 6), ("B", 12)]
    # pass conventions: [] and [tt]
    g2 = sgf.parse_sgf("(;SZ[5];B[];W[tt])")
    assert g2.moves == [("B", 25), ("W", 25)]
    # escaped ']' inside a comment value must not break parsing
    g3 = sgf.parse_sgf("(;SZ[5]C[tricky \\] bracket];B[ab])")
    assert g3.moves == [("B", 5)]
    # whitespace/newlines between tokens
    g4 = sgf.parse_sgf("(;SZ[5]\n ;B[aa]\n ;W[ba]\n)")
    assert len(g4.moves) == 2


def test_sgf_import_rejections():
    import pytest

    from gymgo_tpu.utils import sgf

    with pytest.raises(sgf.SGFError):
        sgf.parse_sgf("(;SZ[5];B[aa];AB[cc]W[bb])")  # mid-game setup stones
    with pytest.raises(sgf.SGFError):
        sgf.parse_sgf("(;SZ[5]AE[aa];B[bb])")  # setup erasure
    with pytest.raises(sgf.SGFError):
        sgf.parse_sgf("(;SZ[19:13];B[aa])")  # rectangular board
    with pytest.raises(sgf.SGFError):
        sgf.parse_sgf("(;SZ[21];B[aa])")  # beyond the 19x19 engine maximum
    with pytest.raises(sgf.SGFError):
        sgf.parse_sgf("(;SZ[x];B[aa])")  # unparseable size
    with pytest.raises(sgf.SGFError):
        sgf.parse_sgf("(;SZ[5]AB[aa]AW[aa];W[bb])")  # AB/AW overlap
    with pytest.raises(sgf.SGFError):
        sgf.parse_sgf("not an sgf")
    with pytest.raises(Exception):
        # occupied-point replay must trip the engine's legality assert
        sgf.replay_sgf("(;SZ[5];B[aa];W[aa])")
    with pytest.raises(sgf.SGFError):
        # zero-liberty setup position: the engine-side recheck must refuse
        sgf.setup_state(sgf.parse_sgf("(;SZ[5]AB[aa]AW[ab][ba];B[cc])"))


def test_sgf_handicap_and_tolerant_imports():
    """Round-4 hardening: third-party records with handicap setup stones,
    FF[3] long property names, compressed point lists, and white-first
    games are handled instead of rejected (VERDICT.md item 7)."""
    import numpy as np

    from gymgo_tpu import gogame, govars
    from gymgo_tpu.utils import sgf

    # root AB handicap: stones placed, white to move first, replay works
    g = sgf.parse_sgf("(;SZ[9]HA[2]KM[0.5]AB[gc][cg];W[ee];B[dd])")
    assert g.handicap == 2 and g.first_to_move == "W"
    assert len(g.setup_black) == 2 and g.setup_white == ()
    game, states = sgf.replay_sgf("(;SZ[9]HA[2]KM[0.5]AB[gc][cg];W[ee];B[dd])")
    assert states[0][govars.BLACK].sum() == 2  # handicap stones pre-placed
    assert gogame.turn(states[0]) == 1  # white to move from setup
    assert states[-1][:2].sum() == 4
    # the setup state's invalid-move plane is engine-derived: occupied
    # points are invalid before any move is played
    assert states[0][govars.INVD_CHNL].sum() >= 2

    # FF[3] long property identifiers carry the short name in uppercase
    g3 = sgf.parse_sgf("(;GaMe[1]SiZe[5]KoMi[1];B[aa];White[ba])")
    assert g3.board_size == 5 and g3.komi == 1.0
    assert g3.moves == [("B", 0), ("W", 1)]

    # FF[4] compressed point list: aa:bb is the 2x2 block
    g4 = sgf.parse_sgf("(;SZ[9]AB[aa:bb];W[ee])")
    assert sorted(g4.setup_black) == [0, 1, 9, 10]

    # white-first games (no handicap) replay from a flipped-turn board
    game_w, states_w = sgf.replay_sgf("(;SZ[5];W[aa];B[bb])")
    assert gogame.turn(states_w[0]) == 1
    assert np.asarray(states_w[-1])[:2].sum() == 2


def test_sgf_real_format_fixture():
    """A KGS-export-formatted handicap record (header block, HA/AB, byo-
    yomi/time/rank properties, escaped comments, a variation) must parse,
    take the main line, and replay legally through the engine."""
    import os

    from gymgo_tpu import govars
    from gymgo_tpu.utils import sgf

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "handicap_kgs_style.sgf")
    with open(path) as f:
        text = f.read()
    game, states = sgf.replay_sgf(text)
    assert game.board_size == 9 and game.handicap == 2
    assert game.komi == 0.5
    assert len(game.setup_black) == 2
    assert game.first_to_move == "W" and game.moves[0][0] == "W"
    assert len(game.moves) == 48  # main line only; the variation is skipped
    assert states[-1][govars.DONE_CHNL].sum() == 0


def test_sgf_variations_flagged_and_main_line_taken():
    """Variation subtrees: main line taken, presence flagged loudly on
    SGFGame.has_variations (round-4 VERDICT item 8)."""
    from gymgo_tpu.utils import sgf

    g = sgf.parse_sgf("(;SZ[5];B[aa](;W[ba];B[ca])(;W[bb]))")
    assert g.has_variations
    assert g.moves == [("B", 0), ("W", 1), ("B", 2)]  # first branch
    g2 = sgf.parse_sgf("(;SZ[5];B[aa];W[ba])")
    assert not g2.has_variations
    # nested continuation without a second branch is NOT a variation
    g3 = sgf.parse_sgf("(;SZ[5];B[aa](;W[ba];B[ca]))")
    assert not g3.has_variations


def test_sgf_collection_api():
    """Multi-game collections: parse_sgf rejects with a pointer to the
    list API; parse_sgf_collection reads every game."""
    import os

    import pytest

    from gymgo_tpu.utils import sgf

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "collection_two_games.sgf")
    with open(path) as f:
        text = f.read()
    with pytest.raises(sgf.SGFError, match="collection of 2 games"):
        sgf.parse_sgf(text)
    games = sgf.parse_sgf_collection(text)
    assert len(games) == 2
    g1, g2 = games
    assert g1.board_size == 5 and g1.komi == 0.5 and g1.result == "B+2.5"
    assert g1.has_variations
    assert g1.moves == [("B", 12), ("W", 6), ("B", 11), ("W", 7), ("B", 8)]
    assert g2.board_size == 9 and g2.komi == 6.5 and g2.result == "W+R"
    assert not g2.has_variations
    assert len(g2.moves) == 4
    # each game replays legally through the engine
    # (replay_sgf wants a single record, so re-serialize per game)
    # single-game parse of each still works through the collection API only
    # trailing garbage after the last tree fails loudly
    with pytest.raises(sgf.SGFError, match="trailing content"):
        sgf.parse_sgf_collection("(;SZ[5];B[aa]) junk")
    with pytest.raises(sgf.SGFError, match="trailing content"):
        sgf.parse_sgf("(;SZ[5];B[aa]) ;W[bb]")


def test_sgf_collection_games_replay():
    """Games from a collection replay through the engine via a per-game
    re-serialization (the strict-legality path)."""
    import os

    from gymgo_tpu.utils import sgf

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "collection_two_games.sgf")
    with open(path) as f:
        games = sgf.parse_sgf_collection(f.read())
    for g in games:
        text = sgf.game_to_sgf([a for _c, a in g.moves], g.board_size,
                               komi=g.komi)
        _game, states = sgf.replay_sgf(text)
        assert len(states) == len(g.moves) + 1


def test_sgf_collection_export_roundtrip(tmp_path):
    """rollout -> per-game records -> one collection file -> parse back."""
    import jax

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.env.batch_env import rollout
    from gymgo_tpu.utils import sgf

    cfg = EnvConfig(board_size=5, batch_size=8, auto_reset=True)
    r = rollout(jax.random.PRNGKey(11), batch_init_state(8, 5), 120, cfg)
    games = sgf.rollout_to_sgf_games(r.actions, r.dones, 5, komi=0.5)
    assert len(games) >= 2
    path = str(tmp_path / "collection.sgf")
    sgf.save_sgf_collection(path, games)
    with open(path) as f:
        parsed = sgf.parse_sgf_collection(f.read())
    assert len(parsed) == len(games)
    for g in parsed:
        assert g.board_size == 5 and g.komi == 0.5
