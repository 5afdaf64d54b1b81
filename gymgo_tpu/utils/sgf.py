"""SGF (Smart Game Format) export for recorded trajectories.

Turns rollout action sequences into standard .sgf files readable by any Go
client — the practical interchange format the reference lacks.  Handles
batched rollouts (one game record per env, split at auto-reset boundaries).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

_COORDS = "abcdefghijklmnopqrs"


def _sgf_coord(action: int, board_size: int) -> str:
    if action == board_size * board_size:
        return ""  # pass move: empty coordinate per SGF convention
    r, c = divmod(int(action), board_size)
    return f"{_COORDS[c]}{_COORDS[r]}"


def game_to_sgf(
    actions: Sequence[int],
    board_size: int,
    komi: float = 0.0,
    result: Optional[str] = None,
    black_name: str = "black",
    white_name: str = "white",
) -> str:
    """One game's flat actions (black first, alternating) -> SGF string."""
    header = (
        f"(;GM[1]FF[4]SZ[{board_size}]KM[{komi}]"
        f"PB[{black_name}]PW[{white_name}]AP[gymgo_tpu]"
    )
    if result:
        header += f"RE[{result}]"
    moves = []
    for i, a in enumerate(actions):
        color = "B" if i % 2 == 0 else "W"
        moves.append(f";{color}[{_sgf_coord(a, board_size)}]")
    return header + "".join(moves) + ")"


def result_string(winning_sign: float) -> str:
    if winning_sign > 0:
        return "B+R"
    if winning_sign < 0:
        return "W+R"
    return "0"


def rollout_to_sgf_games(
    actions: np.ndarray,
    dones: np.ndarray,
    board_size: int,
    komi: float = 0.0,
    env_index: int = 0,
) -> List[str]:
    """Split one env's (T,) action/done columns from a batched rollout into
    completed-game SGF strings (auto-reset starts a fresh record)."""
    actions = np.asarray(actions)[:, env_index]
    dones = np.asarray(dones)[:, env_index]
    games: List[str] = []
    current: List[int] = []
    for a, d in zip(actions, dones):
        current.append(int(a))
        if d:
            games.append(game_to_sgf(current, board_size, komi))
            current = []
    return games


def save_sgf(path: str, sgf: str) -> None:
    with open(path, "w") as f:
        f.write(sgf)
