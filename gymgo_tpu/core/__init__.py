from gymgo_tpu.core.state import (
    init_state,
    batch_init_state,
    action_size,
)
from gymgo_tpu.core.step import step_states, StepInfo, invalid_action_flags
from gymgo_tpu.core.score import areas, winning, liberties, num_liberties
from gymgo_tpu.core.transform import (
    canonical_form,
    batch_canonical_form,
    all_symmetries,
    random_symmetry,
    apply_symmetry,
)
from gymgo_tpu.core.actions import (
    batch_invalid_moves,
    batch_valid_moves,
    children,
    uniform_random_actions,
    weighted_random_actions,
)
