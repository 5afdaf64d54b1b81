"""Scale-shape validation on the virtual 8-device CPU mesh: the 32k-env
sharded configuration (BASELINE configs[3]) compiles, shards, and steps;
throughput correctness (not speed) is what CPU can attest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymgo_tpu.config import EnvConfig
from gymgo_tpu.parallel import ShardedGoEnv, make_mesh


@pytest.mark.slow
def test_32k_envs_sharded_step():
    cfg = EnvConfig(board_size=19, batch_size=32768, auto_reset=True)
    env = ShardedGoEnv(cfg, make_mesh())
    states = env.reset()
    assert len(states.sharding.device_set) == 8
    acts = env.uniform_random_actions(jax.random.PRNGKey(0), states)
    states, res = env.step(states, acts)
    assert states.shape == (32768, 6, 19, 19)
    # every env made a move or passed; board stone count is 0 or 1
    stones = np.asarray(jnp.sum(states[:, :2].astype(jnp.int32), axis=(1, 2, 3)))
    assert set(np.unique(stones)) <= {0, 1}


def test_replay_feed_from_sharded_rollout():
    """configs[3] shape: sharded envs feeding a replay buffer."""
    from gymgo_tpu.rl import ReplayBuffer

    cfg = EnvConfig(board_size=9, batch_size=64, auto_reset=True)
    env = ShardedGoEnv(cfg, make_mesh())
    states = env.reset()
    r = env.rollout(jax.random.PRNGKey(1), states, 8, collect_obs=True)
    buf = ReplayBuffer(capacity=1024, board_size=9)
    bs = buf.init()
    obs = r.obs.reshape(-1, 6, 9, 9)
    pi = jnp.ones((obs.shape[0], 82)) / 82
    v = jnp.zeros((obs.shape[0],))
    bs = jax.jit(buf.add)(bs, obs, pi, v)
    assert int(bs.filled) == 512
    o, p, val, mask, vmask = buf.sample(bs, jax.random.PRNGKey(2), 32)
    assert o.shape == (32, 6, 9, 9)
    assert bool(jnp.all(mask))  # add() without mask marks rows live
