"""BatchGoEnv product-API tests: lockstep stepping, rewards, auto-reset,
lax.scan rollouts, and determinism under jax.random keys."""

import jax
import jax.numpy as jnp
import numpy as np

from gymgo_tpu import govars
from gymgo_tpu.config import EnvConfig
from gymgo_tpu.env import BatchGoEnv, GoEnv
from gymgo_tpu.env.batch_env import rollout


def test_batch_step_matches_single_env():
    cfg = EnvConfig(board_size=5, batch_size=3, reward_method="real")
    env = BatchGoEnv(cfg)
    states = env.reset()

    singles = [GoEnv(size=5, reward_method="real") for _ in range(3)]
    for s in singles:
        s.reset()

    action_rows = [
        [0, 1, 2],
        [5, 6, 7],
        [12, 25, 13],  # env 1 passes
    ]
    for row in action_rows:
        states, res = env.step(states, jnp.asarray(row))
        for i, s in enumerate(singles):
            obs, reward, done, info = s.step(row[i])
            np.testing.assert_array_equal(
                np.asarray(res.obs[i], np.float64), obs
            )
            assert float(res.reward[i]) == reward
            assert bool(res.done[i]) == bool(done)


def test_heuristic_reward_batched():
    cfg = EnvConfig(board_size=7, batch_size=1, reward_method="heuristic")
    env = BatchGoEnv(cfg)
    states = env.reset()
    states, res = env.step(states, jnp.asarray([0]))
    assert float(res.reward[0]) == 49.0
    states, res = env.step(states, jnp.asarray([49]))  # pass
    assert float(res.reward[0]) == 49.0
    states, res = env.step(states, jnp.asarray([49]))  # pass -> done, black ahead
    assert bool(res.done[0])
    assert float(res.reward[0]) == 49.0


def test_auto_reset():
    cfg = EnvConfig(board_size=5, batch_size=2, auto_reset=True)
    env = BatchGoEnv(cfg)
    states = env.reset()
    p = cfg.pass_action
    states, res = env.step(states, jnp.asarray([p, 0]))
    states, res = env.step(states, jnp.asarray([p, 1]))
    assert bool(res.done[0]) and not bool(res.done[1])
    # Next step: env 0 is re-initialized before the action applies.
    states, res = env.step(states, jnp.asarray([0, 2]))
    assert not bool(res.done[0])
    assert not bool(res.invalid_action[0])
    s0 = np.asarray(states[0])
    assert s0[govars.BLACK].sum() == 1  # fresh board with the new move only
    assert s0[govars.DONE_CHNL].sum() == 0


def test_frozen_without_auto_reset():
    cfg = EnvConfig(board_size=5, batch_size=1, auto_reset=False)
    env = BatchGoEnv(cfg)
    states = env.reset()
    p = cfg.pass_action
    for a in [p, p]:
        states, res = env.step(states, jnp.asarray([a]))
    frozen = np.asarray(states)
    states, res = env.step(states, jnp.asarray([0]))
    np.testing.assert_array_equal(np.asarray(states), frozen)


def test_rollout_scan_runs_and_is_deterministic():
    cfg = EnvConfig(board_size=7, batch_size=8, auto_reset=True)
    env = BatchGoEnv(cfg)
    states = env.reset()
    key = jax.random.PRNGKey(0)
    r1 = env.rollout(key, states, 32)
    r2 = env.rollout(key, states, 32)
    np.testing.assert_array_equal(np.asarray(r1.actions), np.asarray(r2.actions))
    np.testing.assert_array_equal(
        np.asarray(r1.final_states), np.asarray(r2.final_states)
    )
    assert r1.actions.shape == (32, 8)
    # Trajectories must be legal: no invalid flags when sampling valid moves.
    states2, res = env.step(
        r1.final_states, env.uniform_random_actions(jax.random.PRNGKey(7), r1.final_states)
    )
    assert not bool(np.asarray(res.invalid_action).any())


def test_rollout_states_follow_gogame():
    """Scanned rollout transitions equal step-by-step facade transitions."""
    from gymgo_tpu import gogame

    cfg = EnvConfig(board_size=5, batch_size=4, auto_reset=False)
    env = BatchGoEnv(cfg)
    states = env.reset()
    key = jax.random.PRNGKey(3)
    r = rollout(key, states, 10, cfg, collect_obs=True)
    acts = np.asarray(r.actions)
    obs = np.asarray(r.obs)
    cur = np.asarray(states, np.float64)
    for t in range(10):
        nxt = []
        for i in range(4):
            if cur[i, govars.DONE_CHNL, 0, 0] == 1:
                nxt.append(cur[i])  # frozen
            else:
                nxt.append(gogame.next_state(cur[i], int(acts[t, i])))
        cur = np.stack(nxt)
        np.testing.assert_array_equal(np.asarray(obs[t], np.float64), cur)
