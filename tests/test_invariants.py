"""Engine-invariant property tests over random trajectories: structural
facts that must hold for every reachable state, independent of the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymgo_tpu import govars
from gymgo_tpu.config import EnvConfig
from gymgo_tpu.core.state import batch_init_state
from gymgo_tpu.core.step import step_states
from gymgo_tpu.env.batch_env import BatchGoEnv


def _random_walk(n, b, steps, seed):
    cfg = EnvConfig(board_size=n, batch_size=b, auto_reset=True)
    env = BatchGoEnv(cfg)
    states = env.reset()
    key = jax.random.PRNGKey(seed)
    snapshots = []
    for t in range(steps):
        key, sub = jax.random.split(key)
        acts = env.uniform_random_actions(sub, states)
        states, res = env.step(states, acts)
        if t % 5 == 0:
            snapshots.append(np.asarray(states))
    return snapshots


@pytest.mark.parametrize("n,seed", [(5, 0), (9, 1)])
def test_state_invariants(n, seed):
    for s in _random_walk(n, 16, 40, seed):
        black, white = s[:, govars.BLACK], s[:, govars.WHITE]
        invd = s[:, govars.INVD_CHNL]
        # 0/1 values everywhere
        assert set(np.unique(s)) <= {0, 1}
        # no cell holds both colors
        assert not np.any((black == 1) & (white == 1))
        # occupied cells are always invalid moves
        assert np.all(invd[(black == 1) | (white == 1)] == 1)
        # uniform indicator planes
        for c in (govars.TURN_CHNL, govars.PASS_CHNL, govars.DONE_CHNL):
            plane = s[:, c].reshape(len(s), -1)
            assert np.all(plane == plane[:, :1])
        # every group on the board has at least one liberty (post-capture
        # invariant; suicide is illegal)
        from gymgo_tpu.core.flood import flood_or, neighbor_or

        for color in (black, white):
            cmask = jnp.asarray(color == 1)
            empty = jnp.asarray((black == 0) & (white == 0))
            has_lib = flood_or(cmask & neighbor_or(empty), cmask)
            assert np.array_equal(np.asarray(has_lib), np.asarray(cmask))


def test_step_purity():
    """step_states must not mutate its inputs (functional purity — the
    reference guards this with np.copy; JAX gives it by construction but we
    pin it anyway)."""
    states = batch_init_state(2, 5)
    before = np.asarray(states).copy()
    step_states(states, jnp.asarray([0, 7]))
    np.testing.assert_array_equal(before, np.asarray(states))


def test_turn_alternates_and_pass_always_valid():
    cfg = EnvConfig(board_size=5, batch_size=4, auto_reset=True)
    env = BatchGoEnv(cfg)
    states = env.reset()
    key = jax.random.PRNGKey(3)
    prev_turn = np.asarray(states[:, govars.TURN_CHNL, 0, 0])
    for t in range(20):
        key, sub = jax.random.split(key)
        # always passing must never be flagged invalid
        acts = jnp.full((4,), cfg.pass_action, jnp.int32) if t % 3 == 0 else \
            env.uniform_random_actions(sub, states)
        was_done = np.asarray(states[:, govars.DONE_CHNL, 0, 0])
        states, res = env.step(states, acts)
        assert not np.any(np.asarray(res.invalid_action))
        new_turn = np.asarray(states[:, govars.TURN_CHNL, 0, 0])
        # turn flips on every applied step (auto-reset restarts at black)
        flipped = (new_turn != prev_turn) | (was_done == 1)
        assert np.all(flipped)
        prev_turn = new_turn


def test_uniform_sampler_distribution():
    """The k-th-valid sampler is uniform over {valid moves} + pass and never
    emits an invalid action."""
    from gymgo_tpu.core.actions import uniform_random_actions

    n, b = 5, 8
    env = BatchGoEnv(EnvConfig(board_size=n, batch_size=b, auto_reset=True))
    states = env.reset()
    key = jax.random.PRNGKey(42)
    for _ in range(12):  # reach a mid-game position with a nontrivial mask
        key, sub = jax.random.split(key)
        states, _ = env.step(states, uniform_random_actions(sub, states))

    invd = np.asarray(states[:, govars.INVD_CHNL].reshape(b, -1))
    valid = np.concatenate([invd == 0, np.ones((b, 1), bool)], axis=1)

    draws = 4000
    keys = jax.random.split(jax.random.PRNGKey(7), draws)
    acts = np.asarray(
        jax.jit(jax.vmap(lambda k: uniform_random_actions(k, states)))(keys)
    )  # (draws, b)
    for i in range(b):
        counts = np.bincount(acts[:, i], minlength=n * n + 1)
        assert counts[~valid[i]].sum() == 0, "sampled an invalid action"
        nv = int(valid[i].sum())
        expect = draws / nv
        got = counts[valid[i]]
        # 4000 draws over <=26 outcomes: each bin ~N(expect, expect);
        # 5.5 sigma two-sided keeps false-positive rate ~1e-6 per test run
        sigma = np.sqrt(expect)
        assert np.all(np.abs(got - expect) < 5.5 * sigma), (
            f"env {i}: counts {got} vs expected {expect:.1f}"
        )
