"""Batched on-device MCTS tests: legality, determinism, terminal-value
exploitation, rollout integration."""

import jax
import jax.numpy as jnp
import numpy as np

from gymgo_tpu.config import EnvConfig
from gymgo_tpu.core.state import batch_init_state
from gymgo_tpu.env.batch_env import BatchGoEnv, rollout
from gymgo_tpu.models import AZNet, AZNetConfig, init_params
from gymgo_tpu.rl.mcts import make_mcts_policy, run_mcts


def _net(n=5):
    cfg = AZNetConfig(board_size=n, channels=16, blocks=1,
                      policy_channels=2, value_channels=2)
    net = AZNet(cfg)
    return net, init_params(jax.random.PRNGKey(0), cfg)


def test_mcts_shapes_legality_determinism():
    net, params = _net(5)
    cfg = EnvConfig(board_size=5, batch_size=4, auto_reset=True)
    env = BatchGoEnv(cfg)
    states = env.reset()
    search = jax.jit(
        lambda k, s: run_mcts(k, s, params, net.apply, num_simulations=12)
    )
    key = jax.random.PRNGKey(1)
    for _ in range(4):
        key, sub = jax.random.split(key)
        r1 = search(sub, states)
        r2 = search(sub, states)
        np.testing.assert_array_equal(np.asarray(r1.actions), np.asarray(r2.actions))
        pol = np.asarray(r1.visit_policy)
        np.testing.assert_allclose(pol.sum(-1), 1.0, rtol=1e-5)
        assert (pol >= 0).all()
        states, res = env.step(states, r1.actions)
        assert not np.asarray(res.invalid_action).any()
    assert r1.root_visits.shape == (4, 26)
    assert int(np.asarray(r1.root_visits).sum(axis=1)[0]) == 12


def test_mcts_finds_winning_pass():
    """Black has a stone, white just passed: passing ends the game with a
    black win (+1 terminal).  With an untrained net (values ~0), the search
    must pile visits onto the provably winning pass move."""
    net, params = _net(5)
    cfg = EnvConfig(board_size=5, batch_size=1)
    env = BatchGoEnv(cfg)
    states = env.reset()
    states, _ = env.step(states, jnp.asarray([12]))  # black center
    states, _ = env.step(states, jnp.asarray([25]))  # white passes
    res = run_mcts(
        jax.random.PRNGKey(0), states, params, net.apply,
        num_simulations=40, dirichlet_fraction=0.0, c_puct=1.0,
    )
    visits = np.asarray(res.root_visits[0])
    assert visits.argmax() == 25, visits
    assert float(res.root_value[0]) > 0.2


def test_mcts_policy_in_rollout():
    net, params = _net(5)
    cfg = EnvConfig(board_size=5, batch_size=2, auto_reset=True)
    policy = make_mcts_policy(params, net.apply, num_simulations=8)
    states = batch_init_state(2, 5)
    r = jax.jit(lambda k, s: rollout(k, s, 6, cfg, policy_fn=policy))(
        jax.random.PRNGKey(2), states
    )
    assert r.actions.shape == (6, 2)
