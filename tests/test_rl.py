"""Model + learner tests: shapes, legality of self-play, train-step update,
checkpoint round-trip."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gymgo_tpu.config import EnvConfig
from gymgo_tpu.core import state as _state
from gymgo_tpu.models import AZNet, AZNetConfig, init_params
from gymgo_tpu.rl import (
    ReplayBuffer,
    az_loss,
    make_train_state,
    selfplay_rollout,
    train_step,
)


def _small_net(n=5):
    cfg = AZNetConfig(board_size=n, channels=16, blocks=1,
                      policy_channels=2, value_channels=2)
    net = AZNet(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return net, params, cfg


def test_net_forward_shapes():
    net, params, cfg = _small_net(5)
    states = _state.batch_init_state(3, 5)
    logits, value = jax.jit(net.apply)(params, states)
    assert logits.shape == (3, 26)
    assert value.shape == (3,)
    assert np.all(np.abs(np.asarray(value)) <= 1.0)


def test_selfplay_rollout_legal_and_shaped():
    net, params, netcfg = _small_net(5)
    env_cfg = EnvConfig(board_size=5, batch_size=4, auto_reset=True)
    states = _state.batch_init_state(4, 5)
    final, batch = jax.jit(
        lambda k, s, p: selfplay_rollout(k, s, p, net.apply, 12, env_cfg)
    )(jax.random.PRNGKey(1), states, params)
    assert batch.obs.shape == (12, 4, 6, 5, 5)
    assert batch.policy_target.shape == (12, 4, 26)
    assert batch.value_target.shape == (12, 4)
    probs = np.asarray(batch.policy_target)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
    # canonical obs: mover is always channel 0's player (turn plane zero)
    assert np.all(np.asarray(batch.obs)[:, :, 2] == 0)


def test_per_game_value_targets_backfill():
    """The reverse-scan backward fill must give every step the terminal sign
    of its OWN game (auto-reset boundaries), with the truncated tail falling
    back to the final state's current winner sign."""
    from gymgo_tpu.rl.selfplay import per_game_value_targets

    T, B = 7, 2
    done = jnp.array([[0, 0], [1, 0], [0, 0], [0, 1], [1, 0], [0, 0], [0, 0]],
                     dtype=bool)
    sign = jnp.array([[9., 9.], [1., 9.], [9., 9.], [9., -1.], [-1., 9.],
                      [9., 9.], [9., 9.]])  # 9s = garbage where not done
    final_states = _state.batch_init_state(B, 5)  # empty => winning == 0
    mover_white = jnp.zeros((T, B), bool)  # keep black's perspective
    z = np.asarray(per_game_value_targets(done, sign, final_states,
                                          mover_white, komi=0.0))
    # env 0: game A ends t=1 (+1), game B ends t=4 (-1), tail -> 0
    np.testing.assert_array_equal(z[:, 0], [1, 1, -1, -1, -1, 0, 0])
    # env 1: game ends t=3 (-1), tail -> 0
    np.testing.assert_array_equal(z[:, 1], [-1, -1, -1, -1, 0, 0, 0])
    # mover flip applies per step
    mw = jnp.ones((T, B), bool)
    z2 = np.asarray(per_game_value_targets(done, sign, final_states, mw, 0.0))
    np.testing.assert_array_equal(z2, -z)


def test_per_game_value_targets_bootstrap_override():
    """z_final overrides ONLY the truncated tail: completed-game rows keep
    their own terminal outcome; the tail takes the caller-supplied
    (net-value) estimate, black's perspective in, mover's perspective out."""
    from gymgo_tpu.rl.selfplay import net_value_black, per_game_value_targets

    T, B = 5, 2
    done = jnp.array([[0, 0], [1, 0], [0, 0], [0, 0], [0, 0]], dtype=bool)
    sign = jnp.array([[9., 9.], [1., 9.], [9., 9.], [9., 9.], [9., 9.]])
    final_states = _state.batch_init_state(B, 5)
    mover_white = jnp.zeros((T, B), bool)
    zf = jnp.array([0.25, -0.5])
    z = np.asarray(per_game_value_targets(done, sign, final_states,
                                          mover_white, 0.0, z_final=zf))
    np.testing.assert_allclose(z[:, 0], [1, 1, 0.25, 0.25, 0.25])
    np.testing.assert_allclose(z[:, 1], [-0.5] * 5)

    # net_value_black sign convention: on a board where it's WHITE's turn
    # the net value (mover = white) must come back negated.
    net, params, netcfg = _small_net(5)
    states = _state.batch_init_state(B, 5)
    from gymgo_tpu.core import step as _step
    states, _ = _step.step_states(states, jnp.array([0, 25]))  # env0: black
    v_black = net_value_black(states, params, net.apply)
    canonical = __import__("gymgo_tpu.core.transform", fromlist=["x"]).batch_canonical_form(states)
    _, v_mover = net.apply(params, canonical)
    turn_white = _state.turn(states) == 1
    np.testing.assert_allclose(
        np.asarray(v_black),
        np.asarray(jnp.where(turn_white, -v_mover, v_mover)),
    )


def test_selfplay_bootstrap_uses_frozen_target_params():
    """value_bootstrap + target_params: every truncated-tail row's target is
    the FROZEN target net's value of the window-final state (black's
    perspective, mover-flipped), not the online net's — the frozen-target
    fix for the measured 13x13 value-head collapse (BENCHMARKS.md)."""
    from gymgo_tpu.models import init_params as _init
    from gymgo_tpu.rl.selfplay import net_value_black

    net, params, netcfg = _small_net(5)
    target = _init(jax.random.PRNGKey(42), netcfg)
    env_cfg = EnvConfig(board_size=5, batch_size=4, auto_reset=True)
    states = _state.batch_init_state(4, 5)
    run = jax.jit(lambda k, s, p, tp: selfplay_rollout(
        k, s, p, net.apply, 40, env_cfg,
        value_bootstrap=True, target_params=tp))
    final, batch = run(jax.random.PRNGKey(3), states, params, target)

    zf = np.asarray(net_value_black(final, target, net.apply))
    done = np.asarray(batch.done)
    mw = np.asarray(batch.mover_white)
    z = np.asarray(batch.value_target)
    z_black = np.where(mw, -z, z)
    T, B = done.shape
    tail_rows = 0
    for b in range(B):
        ends = np.flatnonzero(done[:, b])
        start = ends.max() + 1 if ends.size else 0
        for t in range(start, T):
            # loose tol: in-jit vs out-of-jit conv fusion differs ~1e-3
            np.testing.assert_allclose(z_black[t, b], zf[b], atol=5e-3)
            # exact: every tail row carries the SAME backward-filled value
            assert z_black[t, b] == z_black[start, b]
            tail_rows += 1
    assert tail_rows, "no env truncated mid-game; lengthen the rollout"

    # Same trajectory (actions use online params only), different target
    # net => different tail targets: proves target_params is what's read.
    _, batch_online = run(jax.random.PRNGKey(3), states, params, params)
    assert np.array_equal(np.asarray(batch_online.done), done)
    assert not np.allclose(np.asarray(batch_online.value_target), z)


def test_selfplay_value_targets_respect_game_boundaries():
    """Integration: in an auto-reset rollout long enough to span several
    games per env, the black-perspective value target must be constant
    within each game segment and equal the final state's winner sign on the
    truncated tail."""
    net, params, netcfg = _small_net(5)
    env_cfg = EnvConfig(board_size=5, batch_size=8, auto_reset=True)
    states = _state.batch_init_state(8, 5)
    final, batch = jax.jit(
        lambda k, s, p: selfplay_rollout(k, s, p, net.apply, 120, env_cfg)
    )(jax.random.PRNGKey(5), states, params)
    from gymgo_tpu.core import score as _score_mod

    done = np.asarray(batch.done)
    mw = np.asarray(batch.mover_white)
    z = np.asarray(batch.value_target)
    z_black = np.where(mw, -z, z)
    z_final = np.asarray(_score_mod.winning(final, env_cfg.komi))
    T, B = done.shape
    assert done.any(), "rollout too short to cross a game boundary"
    for b in range(B):
        expect = z_final[b]
        for t in range(T - 1, -1, -1):  # walk backward mirroring the fill
            if done[t, b]:
                expect = z_black[t, b]  # boundary defines its segment
                assert expect in (-1.0, 0.0, 1.0)
            else:
                assert z_black[t, b] == expect, (t, b)


def test_mask_early_pass():
    """Pass is forbidden while stones < threshold and a board move exists,
    allowed at/after the threshold, and always allowed when it is the only
    legal action."""
    from gymgo_tpu.core.actions import batch_valid_moves, mask_early_pass

    states = _state.batch_init_state(3, 3)
    s = np.array(states)  # writable copy
    s[1, 0, 0, :] = 1  # env 1: 3 stones -> at threshold 3, pass allowed
    # env 2: board full -> no board move valid, pass must stay allowed
    s[2, 0] = 1
    s[2, 3] = 1  # all points invalid (occupied)
    states = jnp.asarray(s)
    valid = batch_valid_moves(states) > 0
    out = mask_early_pass(valid, states, min_stones=3)
    assert not bool(out[0, -1])  # empty board, threshold 3: no pass
    assert bool(out[1, -1])  # 3 stones: pass allowed again
    assert bool(out[2, -1])  # full board: pass is the only action
    # board moves untouched
    np.testing.assert_array_equal(np.asarray(out[:, :-1]),
                                  np.asarray(valid[:, :-1]))
    # threshold 0 is the identity
    out0 = mask_early_pass(valid, states, min_stones=0)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(valid))


def test_with_pass_to_win():
    """The match-play wrapper passes exactly when passing seals a win, never
    cedes a tempo otherwise, and still passes when no board move exists."""
    from gymgo_tpu.rl import with_pass_to_win

    n = 5
    pass_idx = n * n
    always_pass = lambda k, s: jnp.full((s.shape[0],), pass_idx, jnp.int32)
    play_00 = lambda k, s: jnp.zeros((s.shape[0],), jnp.int32)

    s = np.zeros((3, 6, n, n), np.int8)
    # env 0: black to move, prev passed, black ahead -> pass wins NOW
    s[0, 0, :3, :] = 1
    s[0, 4] = 1
    # env 1: black to move, prev passed, black BEHIND -> pass would lose
    s[1, 1, :3, :] = 1
    s[1, 4] = 1
    # env 2: like env 0 but previous move was NOT a pass -> pass ends nothing
    s[2, 0, :3, :] = 1
    states = jnp.asarray(s)

    acts = with_pass_to_win(always_pass)(jax.random.PRNGKey(0), states)
    assert int(acts[0]) == pass_idx  # winning pass forced through
    assert int(acts[1]) != pass_idx  # losing pass replaced by a board move
    assert int(acts[2]) != pass_idx  # non-ending pass replaced
    # a winning pass overrides even a policy that wanted to play on
    acts2 = with_pass_to_win(play_00)(jax.random.PRNGKey(0), states)
    assert int(acts2[0]) == pass_idx
    assert int(acts2[1]) == 0 and int(acts2[2]) == 0  # board moves untouched


@pytest.mark.slow
def test_train_step_reduces_loss_on_fixed_batch():
    net, params, netcfg = _small_net(5)
    state, tx = make_train_state(params, learning_rate=1e-2)
    key = jax.random.PRNGKey(0)
    obs = jax.random.bernoulli(key, 0.2, (32, 6, 5, 5)).astype(jnp.int8)
    pi = jax.nn.softmax(jax.random.normal(key, (32, 26)))
    v = jnp.sign(jax.random.normal(key, (32,)))
    mask = jnp.ones((32,), bool)
    batch = (obs, pi, v, mask)

    loss0, _ = az_loss(state.params, net.apply, *batch)
    for _ in range(10):
        state, metrics = train_step(state, tx, net.apply, batch)
    loss1, _ = az_loss(state.params, net.apply, *batch)
    assert float(loss1) < float(loss0)
    assert int(state.step) == 10


def test_replay_buffer_wraps_and_samples():
    buf = ReplayBuffer(capacity=10, board_size=5)
    bs = buf.init()
    obs = jnp.ones((6, 6, 5, 5), jnp.int8)
    pi = jnp.ones((6, 26)) / 26
    v = jnp.ones((6,))
    bs = buf.add(bs, obs, pi, v)
    assert int(bs.filled) == 6 and int(bs.cursor) == 6
    m2 = jnp.array([True, False, True, True, True, False])
    bs = buf.add(bs, obs * 2, pi, -v, m2)
    assert int(bs.filled) == 10 and int(bs.cursor) == 2
    o, p, val, mask, vmask = buf.sample(bs, jax.random.PRNGKey(0), 8)
    assert o.shape == (8, 6, 5, 5)
    assert mask.shape == (8,) and mask.dtype == jnp.bool_
    # add() without vmask mirrors mask: every live row value-supervised
    assert vmask.shape == (8,) and bool(jnp.all(vmask == mask))


def test_checkpoint_roundtrip(tmp_path):
    from gymgo_tpu.utils import checkpoint as ckpt

    net, params, _ = _small_net(5)
    state, _ = make_train_state(params)
    env_states = _state.batch_init_state(4, 5)
    tree = {
        "params": state.params,
        "env_states": env_states,
        "key": jax.random.PRNGKey(3),
    }
    path = str(tmp_path / "ck.npz")
    ckpt.save_npz(path, tree)
    restored = ckpt.restore_npz(path, tree)
    for (a, b) in zip(
        jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_match_play_random_vs_random():
    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core.actions import uniform_random_actions
    from gymgo_tpu.rl import play_match

    cfg = EnvConfig(board_size=5, batch_size=16)
    res = jax.jit(
        lambda k: play_match(
            k, uniform_random_actions, uniform_random_actions, cfg,
            num_games=16, max_steps=120,
        )
    )(jax.random.PRNGKey(0))
    total = int(res.policy_a_wins) + int(res.policy_b_wins) + int(res.ties)
    assert total + int(res.unfinished) == 16
    assert total >= 12  # random 5x5 games nearly always finish in 120 moves
    assert 0.0 <= float(res.a_winrate) <= 1.0
    # area adjudication covers ALL games: finished games keep their result,
    # unfinished ones are scored by area, so scored tallies dominate the
    # finished ones componentwise and sum to the full match size
    assert (int(res.a_scored_wins) + int(res.b_scored_wins)
            + int(res.scored_ties)) == 16
    assert int(res.a_scored_wins) >= int(res.policy_a_wins)
    assert int(res.b_scored_wins) >= int(res.policy_b_wins)
    assert int(res.scored_ties) >= int(res.ties)


def test_match_play_area_adjudication_matches_finished_results():
    """With a move cap generous enough that every game finishes, the
    adjudicated tallies must EQUAL the finished-game tallies (for a done
    board the area sign is the game result)."""
    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core.actions import uniform_random_actions
    from gymgo_tpu.rl import play_match

    cfg = EnvConfig(board_size=5, batch_size=16)
    res = jax.jit(
        lambda k: play_match(
            k, uniform_random_actions, uniform_random_actions, cfg,
            num_games=16, max_steps=400,
        )
    )(jax.random.PRNGKey(3))
    assert int(res.unfinished) == 0
    assert int(res.a_scored_wins) == int(res.policy_a_wins)
    assert int(res.b_scored_wins) == int(res.policy_b_wins)
    assert int(res.scored_ties) == int(res.ties)
    assert float(res.a_scored_winrate) == pytest.approx(
        int(res.policy_a_wins) / 16)


def test_match_play_search_beats_random():
    """One-ply exact-terminal lookahead should beat uniform random on 5x5
    (it never misses an immediately winning/capturing move)."""
    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core.actions import uniform_random_actions
    from gymgo_tpu.rl import make_search_policy, play_match

    net, params, _ = _small_net(5)
    cfg = EnvConfig(board_size=5, batch_size=24)
    search = make_search_policy(params, net.apply, num_sampled=10, c_q=4.0)
    res = jax.jit(
        lambda k: play_match(
            k, search, uniform_random_actions, cfg, num_games=24, max_steps=120
        )
    )(jax.random.PRNGKey(1))
    finished = int(res.policy_a_wins) + int(res.policy_b_wins) + int(res.ties)
    assert finished >= 16
    assert float(res.a_winrate) >= 0.5, res


def test_value_mask_gates_only_value_loss():
    """az_loss value_mask: excluded rows contribute zero value gradient but
    full policy loss — the --value-grounded-only contract."""
    net, params, netcfg = _small_net(5)
    m = 6
    # non-zero identical obs: zero boards give exactly v=0 (zero-init
    # biases), the one value where gated and full means coincide
    obs = jnp.zeros((m, 6, 5, 5), jnp.int8).at[:, 0, 2, 2].set(1)
    pi_t = jnp.ones((m, 26)) / 26
    v_t = jnp.ones((m,))
    mask = jnp.ones((m,), bool)
    vmask = jnp.array([True, True, False, False, False, False])
    full, (pi_f, v_f) = az_loss(params, net.apply, obs, pi_t, v_t, mask)
    gated, (pi_g, v_g) = az_loss(params, net.apply, obs, pi_t, v_t, mask,
                                 vmask)
    assert float(pi_g) == float(pi_f)  # policy term untouched
    # identical rows => per-row v_loss equal; the gated mean equals the
    # full mean here, but against a varying target it must differ:
    v_t2 = jnp.array([1., 1., -1., -1., -1., -1.])
    _, (_, v_full2) = az_loss(params, net.apply, obs, pi_t, v_t2, mask)
    _, (_, v_gate2) = az_loss(params, net.apply, obs, pi_t, v_t2, mask,
                              vmask)
    # gated sees only the +1 rows; full sees mostly -1 rows
    assert abs(float(v_gate2) - float(v_full2)) > 1e-3
    per_row_plus = float(jnp.square(net.apply(params, obs)[1][0] - 1.0))
    assert abs(float(v_gate2) - per_row_plus) < 1e-5


def test_selfplay_grounded_flags_match_done_suffix():
    """batch.grounded is True exactly up to each env's LAST done row."""
    net, params, netcfg = _small_net(5)
    env_cfg = EnvConfig(board_size=5, batch_size=4, auto_reset=True)
    states = _state.batch_init_state(4, 5)
    _, batch = jax.jit(
        lambda k, s, p: selfplay_rollout(k, s, p, net.apply, 50, env_cfg)
    )(jax.random.PRNGKey(9), states, params)
    done = np.asarray(batch.done)
    g = np.asarray(batch.grounded)
    T, B = done.shape
    for b in range(B):
        ends = np.flatnonzero(done[:, b])
        last = ends.max() if ends.size else -1
        np.testing.assert_array_equal(g[:, b], np.arange(T) <= last)


def test_match_play_opening_moves_paired_and_diverse():
    """opening_moves forces the first k plies to shared-per-pair random
    board moves: games (2i, 2i+1) must hold IDENTICAL boards right after
    the opening (color-swapped replays of one opening), while different
    pairs get different openings."""
    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.rl import play_match

    n, games, k_open = 5, 8, 6
    cfg = EnvConfig(board_size=5, batch_size=games)
    pass_idx = jnp.int32(n * n)

    def always_pass(key, states):
        return jnp.full((states.shape[0],), pass_idx, jnp.int32)

    # policies pass immediately after the opening -> games end at ply
    # k_open + 2 and the final boards ARE the opening positions
    _, finals = jax.jit(
        lambda k: play_match(
            k, always_pass, always_pass, cfg, num_games=games,
            max_steps=k_open + 2, opening_moves=k_open, with_states=True,
        )
    )(jax.random.PRNGKey(5))
    finals = np.asarray(finals)
    boards = finals[:, :2]  # stone planes only (pass/turn planes differ)
    for i in range(0, games, 2):
        np.testing.assert_array_equal(boards[i], boards[i + 1])
    distinct = {boards[i].tobytes() for i in range(0, games, 2)}
    assert len(distinct) > 1  # different pairs, different openings
    assert boards.sum(axis=(1, 2, 3)).min() == k_open  # k stones played


def test_match_play_opening_moves_result_sane():
    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core.actions import uniform_random_actions
    from gymgo_tpu.rl import play_match

    cfg = EnvConfig(board_size=5, batch_size=16)
    res = jax.jit(
        lambda k: play_match(
            k, uniform_random_actions, uniform_random_actions, cfg,
            num_games=16, max_steps=120, opening_moves=4,
        )
    )(jax.random.PRNGKey(0))
    total = int(res.policy_a_wins) + int(res.policy_b_wins) + int(res.ties)
    assert total + int(res.unfinished) == 16
    assert total >= 12
