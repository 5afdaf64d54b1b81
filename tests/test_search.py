"""One-ply Gumbel lookahead tests: legality, shapes, determinism, terminal
value exactness, and integration as a rollout policy."""

import jax
import jax.numpy as jnp
import numpy as np

from gymgo_tpu.config import EnvConfig
from gymgo_tpu.core.state import batch_init_state
from gymgo_tpu.env.batch_env import BatchGoEnv, rollout
from gymgo_tpu.models import AZNet, AZNetConfig, init_params
from gymgo_tpu.rl import gumbel_oneply, make_search_policy


def _net(n=5):
    cfg = AZNetConfig(board_size=n, channels=16, blocks=1,
                      policy_channels=2, value_channels=2)
    net = AZNet(cfg)
    return net, init_params(jax.random.PRNGKey(0), cfg)


def test_search_actions_legal_and_deterministic():
    net, params = _net(5)
    cfg = EnvConfig(board_size=5, batch_size=6, auto_reset=True)
    env = BatchGoEnv(cfg)
    states = env.reset()
    key = jax.random.PRNGKey(2)
    # advance a few plies with search actions
    search = jax.jit(
        lambda k, s, p: gumbel_oneply(k, s, p, net.apply, num_sampled=8)
    )
    for t in range(6):
        key, sub = jax.random.split(key)
        res = search(sub, states, params)
        res2 = search(sub, states, params)
        np.testing.assert_array_equal(np.asarray(res.actions), np.asarray(res2.actions))
        states, out = env.step(states, res.actions)
        assert not bool(np.asarray(out.invalid_action).any())
    assert res.sampled_actions.shape == (6, 8)
    assert res.q_values.shape == (6, 8)
    pi = np.asarray(res.improved_policy)
    np.testing.assert_allclose(pi.sum(-1), 1.0, rtol=1e-5)
    assert (pi >= 0).all()


def test_terminal_children_use_exact_outcome():
    """From a position where passing ends the game, the pass child's q must
    be the exact winning sign, not the net value."""
    net, params = _net(5)
    cfg = EnvConfig(board_size=5, batch_size=1)
    env = BatchGoEnv(cfg)
    states = env.reset()
    # black plays (0,0), white passes -> black can end the game by passing;
    # board has one black stone -> black wins (area 25 vs 0)
    states, _ = env.step(states, jnp.asarray([0]))
    states, _ = env.step(states, jnp.asarray([25]))
    res = gumbel_oneply(
        jax.random.PRNGKey(0), states, params, net.apply, num_sampled=26
    )
    sampled = np.asarray(res.sampled_actions[0])
    q = np.asarray(res.q_values[0])
    pass_pos = np.nonzero(sampled == 25)[0]
    assert len(pass_pos) == 1
    assert q[pass_pos[0]] == 1.0  # black to move, pass ends, black wins


def test_search_policy_in_rollout():
    net, params = _net(5)
    cfg = EnvConfig(board_size=5, batch_size=4, auto_reset=True)
    policy = make_search_policy(params, net.apply, num_sampled=6)
    states = batch_init_state(4, 5)
    r = jax.jit(
        lambda k, s: rollout(k, s, 8, cfg, policy_fn=policy)
    )(jax.random.PRNGKey(1), states)
    assert r.actions.shape == (8, 4)


def test_augment_symmetries_consistency():
    """Policy mass must move with the board under augmentation."""
    from gymgo_tpu.rl.selfplay import augment_symmetries

    n = 5
    m = 16
    rng = np.random.default_rng(0)
    obs = np.zeros((m, 6, n, n), np.int8)
    pi = np.zeros((m, n * n + 1), np.float32)
    cells = rng.integers(0, n * n, size=m)
    for i, c in enumerate(cells):
        obs[i, 0, c // n, c % n] = 1
        pi[i, c] = 0.75
        pi[i, n * n] = 0.25  # pass mass must be preserved
    obs2, pi2 = augment_symmetries(
        jax.random.PRNGKey(3), jnp.asarray(obs), jnp.asarray(pi)
    )
    obs2 = np.asarray(obs2)
    pi2 = np.asarray(pi2)
    for i in range(m):
        stone = np.argwhere(obs2[i, 0])[0]
        board_pi = pi2[i, : n * n].reshape(n, n)
        assert board_pi[stone[0], stone[1]] == 0.75
        assert pi2[i, n * n] == 0.25
        assert abs(pi2[i].sum() - 1.0) < 1e-6
