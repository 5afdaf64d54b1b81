from gymgo_tpu.rl.selfplay import (
    SelfPlayBatch,
    per_game_value_targets,
    policy_actions,
    selfplay_gumbel_rollout,
    selfplay_mcts_rollout,
    selfplay_rollout,
    selfplay_search_rollout,
)
from gymgo_tpu.rl.learner import TrainState, make_train_state, train_step, az_loss
from gymgo_tpu.rl.replay import ReplayBuffer
from gymgo_tpu.rl.search import gumbel_oneply, make_search_policy, SearchResult
from gymgo_tpu.rl.mcts import (
    run_mcts,
    make_mcts_policy,
    MCTSResult,
    MCTSTree,
    compact_subtree,
    empty_tree,
    played_child_stats,
)
from gymgo_tpu.rl.gumbel_mcts import run_gumbel_mcts, make_gumbel_mcts_policy, GumbelMCTSResult
from gymgo_tpu.rl.evaluate import play_match, with_pass_to_win, MatchResult
