"""Gumbel MCTS (sequential halving) tests: schedule shape, legality,
determinism, terminal-value exploitation, policy-target sanity, rollout
integration."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gymgo_tpu.config import EnvConfig
from gymgo_tpu.env.batch_env import BatchGoEnv, rollout
from gymgo_tpu.models import AZNet, AZNetConfig, init_params
from gymgo_tpu.rl.gumbel_mcts import (
    make_gumbel_mcts_policy,
    run_gumbel_mcts,
    seq_halving_schedule,
)


def _net(n=5):
    cfg = AZNetConfig(board_size=n, channels=16, blocks=1,
                      policy_channels=2, value_channels=2)
    net = AZNet(cfg)
    return net, init_params(jax.random.PRNGKey(0), cfg)


def test_schedule_properties():
    for n, m in [(32, 16), (16, 16), (7, 4), (64, 8), (1, 16), (200, 16)]:
        s = seq_halving_schedule(n, m)
        assert len(s) == n
        assert all(a >= b for a, b in zip(s, s[1:])), s  # non-increasing
        assert s[0] == max(2, min(m, m)) or s[0] <= m
        assert s[-1] >= 1


def test_gumbel_mcts_shapes_legality_determinism():
    net, params = _net(5)
    cfg = EnvConfig(board_size=5, batch_size=4, auto_reset=True)
    env = BatchGoEnv(cfg)
    states = env.reset()
    search = jax.jit(
        lambda k, s: run_gumbel_mcts(
            k, s, params, net.apply, num_simulations=12, max_considered=8
        )
    )
    key = jax.random.PRNGKey(1)
    for _ in range(4):
        key, sub = jax.random.split(key)
        r1 = search(sub, states)
        r2 = search(sub, states)
        np.testing.assert_array_equal(np.asarray(r1.actions), np.asarray(r2.actions))
        pol = np.asarray(r1.improved_policy)
        np.testing.assert_allclose(pol.sum(-1), 1.0, rtol=1e-5)
        assert (pol >= 0).all()
        # the improved policy must give zero mass to invalid moves
        valid = np.asarray(env.valid_moves(states)) > 0
        assert (pol[~valid] == 0).all()
        states, res = env.step(states, r1.actions)
        assert not np.asarray(res.invalid_action).any()
    assert r1.root_visits.shape == (4, 26)
    assert int(np.asarray(r1.root_visits).sum(axis=1)[0]) == 12
    assert r1.sampled_actions.shape == (4, 8)


def test_gumbel_mcts_finds_winning_pass():
    """Black has a stone, white just passed: passing ends the game with a
    black win.  The halving winner must be the provably winning pass."""
    net, params = _net(5)
    cfg = EnvConfig(board_size=5, batch_size=1)
    env = BatchGoEnv(cfg)
    states = env.reset()
    states, _ = env.step(states, jnp.asarray([12]))  # black center
    states, _ = env.step(states, jnp.asarray([25]))  # white passes
    res = run_gumbel_mcts(
        jax.random.PRNGKey(0), states, params, net.apply,
        num_simulations=32, max_considered=26, c_scale=1.0,
    )
    assert int(res.actions[0]) == 25, np.asarray(res.root_visits[0])
    # and the improved policy concentrates on pass
    assert int(np.asarray(res.improved_policy[0]).argmax()) == 25


def test_gumbel_policy_prefers_higher_q_than_prior_alone():
    """On the winning-pass position the improved policy must upweight pass
    relative to the raw prior (policy-improvement property)."""
    net, params = _net(5)
    cfg = EnvConfig(board_size=5, batch_size=1)
    env = BatchGoEnv(cfg)
    states = env.reset()
    states, _ = env.step(states, jnp.asarray([12]))
    states, _ = env.step(states, jnp.asarray([25]))
    logits, _ = net.apply(params, states.astype(jnp.float32))
    from gymgo_tpu.core.actions import batch_valid_moves

    valid = np.asarray(batch_valid_moves(states)) > 0
    prior = np.asarray(
        jax.nn.softmax(jnp.where(jnp.asarray(valid), logits, -jnp.inf), -1)
    )[0]
    res = run_gumbel_mcts(
        jax.random.PRNGKey(3), states, params, net.apply,
        num_simulations=32, max_considered=26,
    )
    improved = np.asarray(res.improved_policy)[0]
    assert improved[25] > prior[25]


def test_gumbel_mcts_policy_in_rollout():
    net, params = _net(5)
    cfg = EnvConfig(board_size=5, batch_size=4, auto_reset=True)
    policy = make_gumbel_mcts_policy(
        params, net.apply, num_simulations=8, max_considered=4
    )
    from gymgo_tpu.core.state import batch_init_state

    r = rollout(
        jax.random.PRNGKey(5), batch_init_state(4, 5), 6, cfg, policy_fn=policy
    )
    assert r.actions.shape == (6, 4)
    assert r.final_states.shape == (4, 6, 5, 5)


@pytest.mark.slow
def test_improvement_operator_sign_oracle():
    """A pass that would END the game as a certain WIN must receive maximal
    improved-policy mass; the mirrored losing pass must get ~zero.  This
    pins the sign conventions of the whole search/backup pipeline (a flip
    anywhere would anti-train the policy — the bug class this guards)."""
    n = 5

    def uniform_net(params, canonical):
        b = canonical.shape[0]
        return jnp.zeros((b, n * n + 1)), jnp.zeros((b,))

    def board(black_ahead: bool):
        s = np.zeros((1, 6, n, n), np.int8)
        s[0, 0 if black_ahead else 1, :3, :] = 1  # 15 stones for the leader
        s[0, 1 if black_ahead else 0, 4, 0] = 1
        s[0, 4] = 1  # previous move was a pass; black to move
        return jnp.asarray(s)

    res_win = run_gumbel_mcts(
        jax.random.PRNGKey(0), board(True), None, uniform_net,
        num_simulations=64, max_considered=n * n + 1,
    )
    res_lose = run_gumbel_mcts(
        jax.random.PRNGKey(0), board(False), None, uniform_net,
        num_simulations=64, max_considered=n * n + 1,
    )
    pass_idx = n * n
    assert int(res_win.actions[0]) == pass_idx
    assert float(res_win.improved_policy[0, pass_idx]) > 0.95
    assert float(res_lose.improved_policy[0, pass_idx]) < 0.01
    assert int(res_lose.actions[0]) != pass_idx

    # one-ply operator: exact terminal q for the ending pass
    from gymgo_tpu.rl.search import gumbel_oneply

    r = gumbel_oneply(jax.random.PRNGKey(0), board(True), None, uniform_net,
                      num_sampled=n * n + 1)
    slot = int(np.where(np.asarray(r.sampled_actions[0]) == pass_idx)[0][0])
    assert float(r.q_values[0, slot]) == 1.0
    r2 = gumbel_oneply(jax.random.PRNGKey(0), board(False), None, uniform_net,
                       num_sampled=n * n + 1)
    slot2 = int(np.where(np.asarray(r2.sampled_actions[0]) == pass_idx)[0][0])
    assert float(r2.q_values[0, slot2]) == -1.0


def test_packed_tree_tables_agree(monkeypatch):
    """GYMGO_GUMBEL_PACK layouts (int16 visits, log-prior storage) must
    search the same way as the exact f32/int32 default: identical visit
    counts and near-identical action choices (log-prior differs only in
    final-ulp rounding of log(softmax))."""
    import numpy as np

    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.env.batch_env import rollout
    from gymgo_tpu.models import AZNet, AZNetConfig, init_params
    from gymgo_tpu.rl import gumbel_mcts as gm

    n, b = 5, 16
    cfg = EnvConfig(board_size=n, batch_size=b, auto_reset=True)
    states = rollout(jax.random.PRNGKey(2), batch_init_state(b, n),
                     10, cfg).final_states
    netcfg = AZNetConfig(board_size=n, channels=16, blocks=1)
    net = AZNet(netcfg)
    params = init_params(jax.random.PRNGKey(0), netcfg)
    key = jax.random.PRNGKey(7)

    base = gm.run_gumbel_mcts(key, states, params, net.apply,
                              num_simulations=12, max_considered=8)
    monkeypatch.setattr(gm, "_VISIT_DT", jnp.int16)
    monkeypatch.setattr(gm, "_USE_LOGP", True)
    packed = gm.run_gumbel_mcts(key, states, params, net.apply,
                                num_simulations=12, max_considered=8)

    agree = np.mean(np.asarray(base.actions) == np.asarray(packed.actions))
    assert agree >= 0.9, agree
    np.testing.assert_array_equal(np.asarray(base.sampled_actions),
                                  np.asarray(packed.sampled_actions))
    # visit counts identical when the walks coincide; allow ulp-tie slack
    vis_match = np.mean(
        np.asarray(base.root_visits) == np.asarray(packed.root_visits))
    assert vis_match >= 0.99, vis_match
    np.testing.assert_allclose(np.asarray(base.improved_policy),
                               np.asarray(packed.improved_policy),
                               atol=5e-2)
