"""Batched on-device MCTS tests: legality, determinism, terminal-value
exploitation, rollout integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymgo_tpu.config import EnvConfig
from gymgo_tpu.core.state import batch_init_state
from gymgo_tpu.env.batch_env import BatchGoEnv, rollout
from gymgo_tpu.models import AZNet, AZNetConfig, init_params
from gymgo_tpu.rl.mcts import make_mcts_policy, run_mcts

pytestmark = pytest.mark.slow  # minutes-scale; run with the full profile


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


def test_mcts_parallel_waves_legality_and_budget():
    """num_parallel=K: same total simulation budget, K-fold fewer net
    calls; root visit mass must still equal num_simulations and actions
    stay legal."""
    net, params = _net(5)
    cfg = EnvConfig(board_size=5, batch_size=4, auto_reset=True)
    env = BatchGoEnv(cfg)
    states = env.reset()
    search = jax.jit(
        lambda k, s: run_mcts(
            k, s, params, net.apply, num_simulations=16, num_parallel=4
        )
    )
    key = jax.random.PRNGKey(3)
    for _ in range(3):
        key, sub = jax.random.split(key)
        r = search(sub, states)
        assert (np.asarray(r.root_visits).sum(axis=1) == 16).all()
        pol = np.asarray(r.visit_policy)
        np.testing.assert_allclose(pol.sum(-1), 1.0, rtol=1e-5)
        states, res = env.step(states, r.actions)
        assert not np.asarray(res.invalid_action).any()


def test_mcts_parallel_finds_winning_pass():
    """Virtual-loss waves must not break terminal-value exploitation."""
    net, params = _net(5)
    cfg = EnvConfig(board_size=5, batch_size=1)
    env = BatchGoEnv(cfg)
    states = env.reset()
    states, _ = env.step(states, jnp.asarray([12]))
    states, _ = env.step(states, jnp.asarray([25]))
    res = run_mcts(
        jax.random.PRNGKey(0), states, params, net.apply,
        num_simulations=40, num_parallel=4,
        dirichlet_fraction=0.0, c_puct=1.0,
    )
    visits = np.asarray(res.root_visits[0])
    assert visits.argmax() == 25, visits
    assert float(res.root_value[0]) > 0.2


def test_mcts_tree_reuse_across_moves():
    """played_child_stats warm-starts the next ply: the reused root row is
    exactly the previous search's child row, and the warmed search's root
    visit total is warm + num_simulations."""
    from gymgo_tpu.rl.mcts import played_child_stats

    net, params = _net(5)
    cfg = EnvConfig(board_size=5, batch_size=2)
    env = BatchGoEnv(cfg)
    states = env.reset()
    sims = 12
    res, tree = run_mcts(
        jax.random.PRNGKey(5), states, params, net.apply,
        num_simulations=sims, return_tree=True,
    )
    wv, ww = played_child_stats(tree, res.actions)
    bidx = np.arange(2)
    c = np.asarray(tree.child)[bidx, 0, np.asarray(res.actions)]
    for i in range(2):
        if c[i] >= 0:
            np.testing.assert_array_equal(
                np.asarray(wv)[i], np.asarray(tree.visit)[i, c[i]]
            )
    states2, _ = env.step(states, res.actions)
    res2 = run_mcts(
        jax.random.PRNGKey(6), states2, params, net.apply,
        num_simulations=sims, warm_root=(wv, ww),
    )
    expect = np.asarray(wv).sum(axis=1) + sims
    np.testing.assert_array_equal(
        np.asarray(res2.root_visits).sum(axis=1), expect
    )


def test_mcts_selfplay_rollout_reuse_and_waves():
    """selfplay_mcts_rollout with tree_reuse + num_parallel must produce a
    well-formed training batch and legal games end-to-end."""
    from gymgo_tpu.rl.selfplay import selfplay_mcts_rollout

    net, params = _net(5)
    cfg = EnvConfig(board_size=5, batch_size=2, auto_reset=True)
    final, batch = jax.jit(
        lambda k, s: selfplay_mcts_rollout(
            k, s, params, net.apply, 8, cfg,
            num_simulations=8, num_parallel=4, tree_reuse=True,
        )
    )(jax.random.PRNGKey(11), batch_init_state(2, 5))
    assert batch.obs.shape == (8, 2, 6, 5, 5)
    pol = np.asarray(batch.policy_target)
    np.testing.assert_allclose(pol.sum(-1), 1.0, rtol=1e-5)
    assert set(np.unique(np.asarray(batch.value_target))) <= {-1.0, 0.0, 1.0}


class TestSubtreeReuse:
    """Full cross-move tree reuse: compact_subtree + run_mcts(warm_tree=...)."""

    def _setup(self, sims=12, b=6, n=5, par=1):
        import jax
        import jax.numpy as jnp
        from gymgo_tpu.config import EnvConfig
        from gymgo_tpu.core.state import batch_init_state
        from gymgo_tpu.env.batch_env import BatchGoEnv
        from gymgo_tpu.models.az_net import AZNet, AZNetConfig, init_params
        key = jax.random.PRNGKey(0)
        netcfg = AZNetConfig(board_size=n, channels=16, blocks=1,
                             policy_channels=2, value_channels=2)
        net = AZNet(netcfg)
        params = init_params(key, netcfg)
        cfg = EnvConfig(board_size=n, batch_size=b, auto_reset=True)
        env = BatchGoEnv(cfg)
        states = env.reset()
        # advance a few random plies for non-trivial boards
        r = env.rollout(jax.random.fold_in(key, 1), states, 6)
        return key, r.final_states, params, net.apply, n

    def test_compact_invariants(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from gymgo_tpu.core.step import step_states
        from gymgo_tpu.rl.mcts import compact_subtree, run_mcts

        key, states, params, apply_fn, n = self._setup()
        res, tree = run_mcts(
            jax.random.fold_in(key, 2), states, params, apply_fn,
            num_simulations=12, return_tree=True,
        )
        cap = 12
        wt = compact_subtree(tree, res.actions, cap)
        b = states.shape[0]
        bidx = np.arange(b)
        old_child = np.asarray(tree.child)[bidx, 0, np.asarray(res.actions)]
        has = old_child >= 0

        # new root slot holds the played child's state and edge stats
        stepped, _ = step_states(states, res.actions)
        np.testing.assert_array_equal(
            np.asarray(wt.node_states[:, 0])[has],
            np.asarray(tree.node_states)[bidx[has], old_child[has]],
        )
        np.testing.assert_array_equal(
            np.asarray(wt.node_states[:, 0])[has], np.asarray(stepped)[has]
        )
        np.testing.assert_array_equal(
            np.asarray(wt.visit[:, 0])[has],
            np.asarray(tree.visit)[bidx[has], old_child[has]],
        )
        # cold envs come back all-cold
        assert (np.asarray(wt.visit)[~has] == 0).all()
        assert (np.asarray(wt.child)[~has] == -1).all()

        # structural consistency: every child pointer targets a slot whose
        # parent pointer points back
        ch = np.asarray(wt.child)
        par = np.asarray(wt.parent)
        for e in range(b):
            for i in range(cap):
                for a, c in enumerate(ch[e, i]):
                    if c >= 0:
                        assert par[e, c] == i, (e, i, a, c)
            # root parent is -1
            assert par[e, 0] == -1

    def test_warm_tree_search_counts(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from gymgo_tpu.env.batch_env import batch_step
        from gymgo_tpu.config import EnvConfig
        from gymgo_tpu.rl.mcts import compact_subtree, run_mcts

        key, states, params, apply_fn, n = self._setup()
        sims = 12
        res, tree = run_mcts(
            jax.random.fold_in(key, 3), states, params, apply_fn,
            num_simulations=sims, return_tree=True,
        )
        wt = compact_subtree(tree, res.actions, sims)
        cfg = EnvConfig(board_size=n, batch_size=states.shape[0], auto_reset=True)
        new_states, sr = batch_step(states, res.actions, cfg)
        live = ~np.asarray(sr.done) & ~np.asarray(sr.was_done) & ~np.asarray(sr.invalid_action)

        res2, tree2 = run_mcts(
            jax.random.fold_in(key, 4), new_states, params, apply_fn,
            num_simulations=sims, warm_tree=wt, return_tree=True,
        )
        # root visit total == carried visits + new simulations
        carried = np.asarray(wt.visit[:, 0]).sum(axis=1)
        total = np.asarray(res2.root_visits).sum(axis=1)
        np.testing.assert_array_equal(total[live], (carried + sims)[live])
        # actions legal
        from gymgo_tpu.core import actions as _actions
        valid = np.asarray(_actions.batch_valid_moves(new_states)) > 0
        a2 = np.asarray(res2.actions)
        assert valid[np.arange(len(a2)), a2].all()

    def test_warm_tree_with_parallel_waves(self):
        import jax
        import numpy as np
        from gymgo_tpu.rl.mcts import compact_subtree, run_mcts
        from gymgo_tpu.core.step import step_states

        key, states, params, apply_fn, n = self._setup()
        res, tree = run_mcts(
            jax.random.fold_in(key, 5), states, params, apply_fn,
            num_simulations=12, num_parallel=4, return_tree=True,
        )
        wt = compact_subtree(tree, res.actions, 8)  # truncating cap
        stepped, _ = step_states(states, res.actions)
        res2 = run_mcts(
            jax.random.fold_in(key, 6), stepped, params, apply_fn,
            num_simulations=8, num_parallel=4, warm_tree=wt,
        )
        assert np.asarray(res2.root_visits).sum() > 0

    def test_selfplay_subtree_mode(self):
        import jax
        import numpy as np
        from gymgo_tpu.config import EnvConfig
        from gymgo_tpu.rl.selfplay import selfplay_mcts_rollout

        key, states, params, apply_fn, n = self._setup()
        cfg = EnvConfig(board_size=n, batch_size=states.shape[0], auto_reset=True)
        final, batch = selfplay_mcts_rollout(
            jax.random.fold_in(key, 7), states, params, apply_fn,
            num_steps=6, config=cfg, num_simulations=8,
            tree_reuse="subtree",
        )
        pol = np.asarray(batch.policy_target)
        assert np.isfinite(pol).all()
        s = pol.sum(axis=-1)
        np.testing.assert_allclose(s[np.asarray(batch.mask)], 1.0, atol=1e-5)
