"""Carried-capture equivalence: the flood-free capture path must be
bit-identical to the stateless flood path.

The accelerator (step.PlanesState.atari) relies on the invariant that an
opponent group loses its last liberty at step t iff its sole liberty at the
end of step t-1 is exactly the point played — so captures can be resolved
from the previous step's classification flood with no flood at all.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymgo_tpu.core import actions as _actions
from gymgo_tpu.core import step as _step
from gymgo_tpu.core.state import batch_init_state
from gymgo_tpu.config import EnvConfig
from gymgo_tpu.env import batch_env


def _np_group_atari(black: np.ndarray, white: np.ndarray) -> np.ndarray:
    """Brute-force per-stone atari encoding (sole-liberty flat idx + 1)."""
    n = black.shape[-1]
    out = np.zeros((n, n), np.int16)
    stones = black | white
    seen = np.zeros((n, n), bool)
    for r in range(n):
        for c in range(n):
            if not stones[r, c] or seen[r, c]:
                continue
            color = black if black[r, c] else white
            # BFS the group
            group = [(r, c)]
            seen[r, c] = True
            libs = set()
            i = 0
            while i < len(group):
                gr, gc = group[i]
                i += 1
                for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    nr, nc = gr + dr, gc + dc
                    if not (0 <= nr < n and 0 <= nc < n):
                        continue
                    if color[nr, nc] and not seen[nr, nc]:
                        seen[nr, nc] = True
                        group.append((nr, nc))
                    elif not stones[nr, nc]:
                        libs.add(nr * n + nc)
            if len(libs) == 1:
                enc = next(iter(libs)) + 1
                for gr, gc in group:
                    out[gr, gc] = enc
    return out


_jit_step_states = jax.jit(_step.step_states)
_jit_actions = jax.jit(_actions.uniform_random_actions)
_jit_init_atari = jax.jit(_step.init_atari)
_jit_step_planes = jax.jit(_step.step_planes)


def _random_positions(key, b, n, steps):
    """Play ``steps`` uniform-random legal moves from empty boards (flood
    path) and return the resulting batch of states."""
    states = batch_init_state(b, n)
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        acts = _jit_actions(k, states)
        states, _ = _jit_step_states(states, acts)
    return states


def test_init_atari_matches_bruteforce():
    states = _random_positions(jax.random.PRNGKey(3), 16, 7, 30)
    ps = _step.planes_from_states(states)
    atari = np.asarray(_jit_init_atari(ps))
    black = np.asarray(ps.black)
    white = np.asarray(ps.white)
    for i in range(black.shape[0]):
        expect = _np_group_atari(black[i], white[i])
        np.testing.assert_array_equal(atari[i], expect)


@pytest.mark.parametrize("n", [5, 7, 9])
def test_carried_step_equals_flood_step(n):
    """Stepping with the carried atari plane == stepping with the capture
    flood, across many random game positions (captures included)."""
    b = 32
    key = jax.random.PRNGKey(n)
    states = batch_init_state(b, n)
    total_captured = 0
    for i in range(50):
        k = jax.random.fold_in(key, i)
        acts = _jit_actions(k, states)
        ps = _step.planes_from_states(states)
        ps_c = ps._replace(atari=_jit_init_atari(ps))
        new_flood, info_flood = _jit_step_planes(ps, acts)
        new_carry, info_carry = _jit_step_planes(ps_c, acts)
        for name in _step.PlanesState._fields:
            if name == "atari":
                continue
            np.testing.assert_array_equal(
                np.asarray(getattr(new_flood, name)),
                np.asarray(getattr(new_carry, name)),
                err_msg=f"field {name} diverged at step {i}",
            )
        for name in _step.StepInfo._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(info_flood, name)),
                np.asarray(getattr(info_carry, name)),
                err_msg=f"info {name} diverged at step {i}",
            )
        # the refreshed carry must equal a from-scratch seeding of the result
        np.testing.assert_array_equal(
            np.asarray(new_carry.atari),
            np.asarray(_jit_init_atari(new_flood)),
            err_msg=f"carried atari stale at step {i}",
        )
        total_captured += int(jnp.sum(info_flood.num_captured))
        states = _step.states_from_planes(new_flood)
    assert total_captured > 0, "test positions never captured — not probative"


def test_rollout_uses_carry_and_matches_stepwise():
    """Auto-reset scan rollout (carried path) == manual flood-path loop."""
    cfg = EnvConfig(board_size=7, batch_size=24, auto_reset=True)
    key = jax.random.PRNGKey(11)
    states = batch_init_state(cfg.batch_size, cfg.board_size)
    r = batch_env.rollout(key, states, 80, cfg)

    # replay the identical action stream through the stateless path
    ref = states
    for t in range(80):
        if cfg.auto_reset:
            from gymgo_tpu.core import state as _state

            done_pre = _state.game_ended(ref)
            ref = jnp.where(done_pre[:, None, None, None], jnp.zeros_like(ref), ref)
        ref, _ = _jit_step_states(ref, r.actions[t])
    np.testing.assert_array_equal(np.asarray(r.final_states), np.asarray(ref))


def test_carried_ko_surr_matches_stateless():
    """A real ko: the carried ko_surr plane must reproduce the stateless
    path's ko invalid-point bit-exactly, including its one-ply expiry."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gymgo_tpu.core import step as _step

    n = 5
    # Canonical ko diamond:
    #   . B W .
    #   B W . W   (empty at (1,2))
    #   . B W .
    # Black to move: B plays (1,2), captures W(1,1) -> ko at (1,1) for white.
    states = np.zeros((1, 6, n, n), np.int8)
    B, W = 0, 1
    for (r, c) in [(0, 1), (1, 0), (2, 1)]:
        states[0, B, r, c] = 1
    for (r, c) in [(0, 2), (1, 1), (1, 3), (2, 2)]:
        states[0, W, r, c] = 1
    states = jnp.asarray(states)
    # INVD left all-zero: black playing (1,2) is legal (it captures W(1,1)).

    ps = _step.planes_from_states(states)
    ps_carried = ps._replace(
        atari=_step.init_atari(ps), ko_surr=_step.init_ko_surr(ps)
    )
    a = jnp.asarray([1 * n + 2], jnp.int32)

    ns_stateless, info_s = _step.step_planes(ps, a)
    ns_carried, info_c = _step.step_planes(ps_carried, a)

    np.testing.assert_array_equal(
        np.asarray(ns_stateless.invd), np.asarray(ns_carried.invd)
    )
    # the ko point (1,1) must be invalid for white now
    assert bool(ns_carried.invd[0, 1, 1])
    assert int(info_c.num_captured[0]) == 1

    # one-ply expiry: white plays elsewhere; ko point reopens identically
    b2 = jnp.asarray([4 * n + 0], jnp.int32)
    ns2_s, _ = _step.step_planes(ns_stateless, b2)
    ns2_c, _ = _step.step_planes(ns_carried, b2)
    np.testing.assert_array_equal(np.asarray(ns2_s.invd), np.asarray(ns2_c.invd))
    assert not bool(ns2_c.invd[0, 1, 1])
