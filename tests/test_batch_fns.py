"""Batch-path tests: the reference's canonical-form case plus the batch
transition-consistency coverage the reference lacks (which is how its Q1
pass/capture misalignment bug survived — SURVEY §2.6)."""

import numpy as np

from reference_oracle import load_reference_gogame
from gymgo_tpu import gogame, govars


def test_batch_canonical_form():
    states = gogame.batch_init_state(2, 7)
    states[0] = gogame.next_state(states[0], 0)

    assert states[0, govars.BLACK].sum() == 1
    assert states[0, govars.WHITE].sum() == 0

    states = gogame.batch_canonical_form(states)

    assert states[0, govars.BLACK].sum() == 0
    assert states[0, govars.WHITE].sum() == 1
    assert states[1, govars.BLACK].sum() == 0
    assert states[1, govars.WHITE].sum() == 0
    for i in range(2):
        assert gogame.turn(states[i]) == govars.BLACK

    canon_again = gogame.batch_canonical_form(states)
    np.testing.assert_array_equal(canon_again, states)


def test_batch_next_states_matches_single_path():
    """Our batch transition must equal per-env single-state stepping —
    including the mixed pass/capture batches where the reference batch path
    is wrong (state_utils.py:183-211)."""
    ref = load_reference_gogame()
    np.random.seed(5)
    boards = []
    for seed in range(4):
        s = ref.init_state(5)
        for _ in range(8):
            # Board moves only: keep every board mid-game (stepping finished
            # games is a documented divergence — engine freezes, ref doesn't).
            valid = np.nonzero(ref.valid_moves(s)[:-1])[0]
            s = ref.next_state(s, np.random.choice(valid))
        boards.append(s)
    batch = np.stack(boards)

    # One pass in a low batch index, then moves (the Q1 trigger shape).
    actions = []
    for i, s in enumerate(batch):
        if i == 0:
            actions.append(25)  # pass on 5x5
        else:
            valid = np.nonzero(ref.valid_moves(s)[:-1])[0]
            actions.append(valid[0] if len(valid) else 25)
    actions = np.array(actions)

    batch_out = gogame.batch_next_states(batch, actions)
    for i in range(len(batch)):
        single = gogame.next_state(batch[i], actions[i])
        np.testing.assert_array_equal(batch_out[i], single)
        # and the single path itself is reference-exact
        ref_single = ref.next_state(batch[i], actions[i])
        np.testing.assert_array_equal(single, ref_single)


def test_batch_accessors_match_reference():
    ref = load_reference_gogame()
    np.random.seed(11)
    boards = []
    for seed in range(6):
        s = ref.init_state(7)
        for _ in range(10):
            if ref.game_ended(s):
                break
            s = ref.next_state(s, ref.random_action(s))
        boards.append(s)
    batch = np.stack(boards)

    np.testing.assert_array_equal(
        ref.batch_invalid_moves(batch), gogame.batch_invalid_moves(batch)
    )
    np.testing.assert_array_equal(
        ref.batch_valid_moves(batch), gogame.batch_valid_moves(batch)
    )
    np.testing.assert_array_equal(
        ref.batch_prev_player_passed(batch), gogame.batch_prev_player_passed(batch)
    )
    np.testing.assert_array_equal(
        ref.batch_game_ended(batch), gogame.batch_game_ended(batch)
    )
    np.testing.assert_array_equal(ref.batch_turn(batch), gogame.batch_turn(batch))
    ref_ba, ref_wa = ref.batch_areas(batch)
    tpu_ba, tpu_wa = gogame.batch_areas(batch)
    np.testing.assert_array_equal(ref_ba, tpu_ba)
    np.testing.assert_array_equal(ref_wa, tpu_wa)
    np.testing.assert_array_equal(
        ref.batch_winning(batch, komi=1.5), gogame.batch_winning(batch, komi=1.5)
    )
    np.testing.assert_array_equal(
        ref.batch_canonical_form(batch), gogame.batch_canonical_form(batch)
    )
