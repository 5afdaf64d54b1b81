"""Evaluate a trained checkpoint against uniform-random (or another
checkpoint) with its FULL training-time search — the strength yardstick.

train.py's periodic eval defaults to the cheap one-ply-k8 lookahead, which
understates trained nets (measured at 13x13: one-ply 0.81 vs Gumbel-32
0.92 for the same checkpoint).  This script loads params from a train.py
checkpoint tree and plays batched matches with the Gumbel MCTS policy
under the pass-to-win match rule.

Usage:
  timeout 1500 python scripts/eval_ckpt.py --ckpt checkpoints/az13_gumbel.npz \
      --board 13 --sims 32 --games 128
  # head-to-head between two checkpoints:
  timeout 1500 python scripts/eval_ckpt.py --ckpt A.npz --opp-ckpt B.npz ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_params(path: str, netcfg):
    import jax

    from gymgo_tpu.models import init_params
    from gymgo_tpu.utils import checkpoint as ckpt

    template = {"params": init_params(jax.random.PRNGKey(0), netcfg)}
    return ckpt.restore_npz(path, template)["params"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--opp-ckpt", default="",
                    help="opponent checkpoint; empty = uniform-random")
    ap.add_argument("--board", type=int, default=13)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--opp-channels", type=int, default=0,
                    help="opponent net width (0 = same as --channels); "
                         "lets a grown flagship play its smaller parent")
    ap.add_argument("--opp-blocks", type=int, default=0,
                    help="opponent net depth (0 = same as --blocks)")
    ap.add_argument("--sims", type=int, default=32)
    ap.add_argument("--gumbel-m", type=int, default=8)
    ap.add_argument("--games", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=128,
                    help="games per device batch; requests larger than "
                         "this run as multiple chunks aggregated host-side "
                         "(the 19x19 two-net eval kernel-faulted the TPU "
                         "worker at a single 256-game batch — chunking "
                         "makes any --games total safe)")
    ap.add_argument("--opening-moves", type=int, default=0,
                    help=">0: force the first k plies to random board "
                         "moves shared within each color-swapped game "
                         "pair — opening diversity so head-to-heads "
                         "measure strength, not empty-board style lock")
    ap.add_argument("--max-steps", type=int, default=0,
                    help="0 = auto (2.5 * board^2)")
    ap.add_argument("--komi", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core.actions import uniform_random_actions
    from gymgo_tpu.models import AZNet, AZNetConfig
    from gymgo_tpu.rl import (
        make_gumbel_mcts_policy, play_match, with_pass_to_win,
    )

    netcfg = AZNetConfig(board_size=args.board, channels=args.channels,
                         blocks=args.blocks)
    opp_cfg = AZNetConfig(
        board_size=args.board,
        channels=args.opp_channels or args.channels,
        blocks=args.opp_blocks or args.blocks,
    )

    def search_policy(params, cfg):
        # pass suppressed inside the search; the wrapper adds only the
        # game-sealing pass (the policy-aware pattern, BENCHMARKS.md).
        return with_pass_to_win(make_gumbel_mcts_policy(
            params, AZNet(cfg).apply, num_simulations=args.sims,
            max_considered=args.gumbel_m, komi=args.komi,
            pass_min_stones=1 << 20), komi=args.komi)

    policy_a = search_policy(load_params(args.ckpt, netcfg), netcfg)
    if args.opp_ckpt:
        policy_b = search_policy(load_params(args.opp_ckpt, opp_cfg), opp_cfg)
        b_name = args.opp_ckpt
    else:
        policy_b = lambda k, s: uniform_random_actions(k, s)  # noqa: E731
        b_name = "uniform-random"

    chunk = min(args.chunk, args.games)
    cfg = EnvConfig(board_size=args.board, batch_size=chunk,
                    komi=args.komi, auto_reset=False)
    max_steps = args.max_steps or int(2.5 * args.board * args.board)

    import jax as _jax

    @_jax.jit
    def run_chunk(key):
        return play_match(key, policy_a, policy_b, cfg, num_games=chunk,
                          max_steps=max_steps,
                          opening_moves=args.opening_moves)

    wins = losses = ties = unfinished = 0
    remaining = args.games
    ci = 0
    while remaining > 0:
        res = run_chunk(jax.random.fold_in(
            jax.random.PRNGKey(args.seed), ci))
        wins += int(res.policy_a_wins)
        losses += int(res.policy_b_wins)
        ties += int(res.ties)
        unfinished += int(res.unfinished)
        remaining -= chunk
        ci += 1
        if args.games > chunk:
            print(f"  chunk {ci}: cumulative {wins}W/{losses}L/{ties}T "
                  f"({unfinished} unfinished)", flush=True)
    finished = max(wins + losses + ties, 1)
    print(f"{args.ckpt} (gumbel-{args.sims}"
          + (f", open-{args.opening_moves}" if args.opening_moves else "")
          + f") vs {b_name}: {wins}W/{losses}L/{ties}T, "
          f"{unfinished} unfinished, winrate={wins / finished:.3f}")


if __name__ == "__main__":
    main()
