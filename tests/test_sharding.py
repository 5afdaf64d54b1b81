"""Multi-device tests on the 8-way virtual CPU mesh: sharded stepping must be
bit-identical to unsharded, and RNG folding must be sharding-invariant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymgo_tpu.config import EnvConfig
from gymgo_tpu.env import BatchGoEnv
from gymgo_tpu.parallel import (
    ShardedGoEnv,
    env_sharding,
    fold_env_keys,
    make_mesh,
    shard_states,
)


def test_virtual_device_count():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_unsharded():
    cfg = EnvConfig(board_size=7, batch_size=16, auto_reset=True)
    plain = BatchGoEnv(cfg)
    sharded = ShardedGoEnv(cfg, make_mesh())

    s_plain = plain.reset()
    s_shard = sharded.reset()
    key = jax.random.PRNGKey(0)
    for t in range(12):
        key, sub = jax.random.split(key)
        acts = plain.uniform_random_actions(sub, s_plain)
        s_plain, r_plain = plain.step(s_plain, acts)
        s_shard, r_shard = sharded.step(s_shard, acts)
        np.testing.assert_array_equal(np.asarray(s_plain), np.asarray(s_shard))
        np.testing.assert_array_equal(
            np.asarray(r_plain.reward), np.asarray(r_shard.reward)
        )


def test_sharded_rollout_runs():
    cfg = EnvConfig(board_size=9, batch_size=32, auto_reset=True)
    env = ShardedGoEnv(cfg)
    states = env.reset()
    r = env.rollout(jax.random.PRNGKey(1), states, 20)
    assert r.actions.shape == (20, 32)
    assert np.asarray(r.final_states).shape == (32, 6, 9, 9)


def test_fold_env_keys_sharding_invariant():
    key = jax.random.PRNGKey(42)
    keys = fold_env_keys(key, 16)
    mesh = make_mesh()
    sharded_keys = jax.device_put(keys, env_sharding(mesh, keys.ndim))
    np.testing.assert_array_equal(np.asarray(keys), np.asarray(sharded_keys))


def test_state_sharding_layout():
    cfg = EnvConfig(board_size=7, batch_size=8)
    mesh = make_mesh()
    env = BatchGoEnv(cfg)
    states = shard_states(env.reset(), mesh)
    # one env shard per device
    assert len(states.sharding.device_set) == 8


@pytest.mark.slow
def test_sharded_search_matches_unsharded():
    """run_mcts on env-sharded states over the 8-device mesh must return
    the same search results as unsharded — the search (tree arrays, walk,
    exact env expansion) is per-env and must partition cleanly (the
    multi-chip dryrun executes the Gumbel analog; this pins PUCT + equality)."""
    from gymgo_tpu.models import AZNet, AZNetConfig, init_params
    from gymgo_tpu.rl.mcts import run_mcts

    netcfg = AZNetConfig(board_size=5, channels=8, blocks=1)
    net = AZNet(netcfg)
    params = init_params(jax.random.PRNGKey(0), netcfg)

    cfg = EnvConfig(board_size=5, batch_size=16, auto_reset=True)
    env = BatchGoEnv(cfg)
    states = env.reset()
    r = env.rollout(jax.random.PRNGKey(3), states, 6)
    states = r.final_states

    def search(key, states):
        res = run_mcts(key, states, params, net.apply,
                       num_simulations=8, num_parallel=2)
        return res.actions, res.root_visits, res.visit_policy

    key = jax.random.PRNGKey(9)
    plain = jax.jit(search)(key, states)

    mesh = make_mesh()
    sharded_states = jax.device_put(states, env_sharding(mesh, 4))
    sharded = jax.jit(search)(key, sharded_states)

    np.testing.assert_array_equal(np.asarray(plain[0]), np.asarray(sharded[0]))
    np.testing.assert_array_equal(np.asarray(plain[1]), np.asarray(sharded[1]))
    np.testing.assert_allclose(
        np.asarray(plain[2]), np.asarray(sharded[2]), rtol=1e-6
    )
