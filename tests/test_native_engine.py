"""Native C++ engine must be bit-identical to the reference oracle and the
JAX engine across random games and scripted scenarios."""

import numpy as np
import pytest

from reference_oracle import load_reference_gogame
from gymgo_tpu import gogame
from gymgo_tpu.native import NativeGoEngine


@pytest.mark.parametrize("size,seed,steps", [(5, 0, 60), (7, 1, 100), (9, 2, 120), (19, 0, 80)])
def test_native_matches_reference_random_games(size, seed, steps):
    ref = load_reference_gogame()
    eng = NativeGoEngine(size)
    np.random.seed(seed)
    s_ref = ref.init_state(size)
    s_nat = np.zeros((6, size, size), np.int8)
    for t in range(steps):
        if ref.game_ended(s_ref):
            break
        a = ref.random_action(s_ref)
        s_ref = ref.next_state(s_ref, a)
        s_nat, status = eng.next_state(s_nat, int(a))
        assert status == 0
        np.testing.assert_array_equal(
            s_ref.astype(np.int8), s_nat, err_msg=f"step {t} action {a}"
        )
        ba, wa = eng.areas(s_nat)
        assert (ba, wa) == ref.areas(s_ref)


def test_native_status_codes():
    eng = NativeGoEngine(5)
    s = np.zeros((6, 5, 5), np.int8)
    s1, st = eng.next_state(s, 0)
    assert st == 0
    # occupied -> invalid
    _, st = eng.next_state(s1, 0)
    assert st == 1
    # double pass -> done; further steps report game-over
    s2, _ = eng.next_state(s1, 25)
    s3, _ = eng.next_state(s2, 25)
    assert s3[5, 0, 0] == 1
    _, st = eng.next_state(s3, 3)
    assert st == 2


def test_native_batch_matches_facade():
    eng = NativeGoEngine(7)
    np.random.seed(3)
    states = gogame.batch_init_state(8, 7)
    for _ in range(15):
        actions = []
        for i in range(8):
            valid = np.nonzero(gogame.valid_moves(states[i]))[0]
            actions.append(np.random.choice(valid))
        actions = np.array(actions)
        jax_next = gogame.batch_next_states(states, actions)
        nat_next, status = eng.batch_next_states(states, actions)
        assert (status == 0).all()
        np.testing.assert_array_equal(jax_next.astype(np.int8), nat_next)
        states = jax_next


def test_batch_parallel_matches_serial():
    """OpenMP batch stepping (B >= 32 triggers the parallel loop) is
    bit-identical to per-env single stepping, and batch_areas matches
    per-env areas."""
    import numpy as np

    from gymgo_tpu.native import NativeGoEngine

    n, b = 9, 128
    eng = NativeGoEngine(n)
    rng = np.random.default_rng(5)
    states = np.zeros((b, 6, n, n), np.int8)
    for t in range(40):
        invd = states[:, 3].reshape(b, -1)
        acts = np.empty((b,), np.int32)
        for i in range(b):
            valid = np.flatnonzero(invd[i] == 0)
            k = rng.integers(0, valid.size + 1)
            acts[i] = n * n if k == valid.size else valid[k]
        out, status = eng.batch_next_states(states, acts)
        for i in range(0, b, 17):  # spot-check against the single path
            single, st = eng.next_state(states[i], int(acts[i]))
            assert st == status[i]
            np.testing.assert_array_equal(out[i], single)
        states = out
    ba, wa = eng.batch_areas(states)
    for i in range(0, b, 13):
        sb, sw = eng.areas(states[i])
        assert (ba[i], wa[i]) == (sb, sw)
