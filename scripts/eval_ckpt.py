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

Fault tolerance (--retries N, default 2): the TPU worker has kernel-
faulted mid-eval three times across rounds 3-4, at batch sizes as small
as 128 games.  With retries on, this process becomes a light supervisor
(no jax import): it runs itself as a child with a per-chunk JSONL ledger
(--state-file), and when the child dies it waits out the tunnel wedge
(device probe in a fresh subprocess) and relaunches — completed chunks
are never replayed, so one flake costs one chunk plus a recompile.
Chunk RNG is keyed by chunk index (fold_in), so redone chunks play the
exact same games.  --retries 0 = the bare single-process path.
"""

from __future__ import annotations

import argparse
import hashlib
import math
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
    ap.add_argument("--retries", type=int, default=2,
                    help="max child relaunches after a worker crash; "
                         "0 = run bare in this process (child mode)")
    ap.add_argument("--state-file", default="",
                    help="JSONL chunk ledger; auto-derived under logs/ "
                         "when --retries > 0 and unset")
    ap.add_argument("--child-timeout", type=float, default=5400.0,
                    help="supervisor kills a child attempt after this "
                         "many seconds (hang protection)")
    args = ap.parse_args()

    n_chunks = max(1, math.ceil(args.games / min(args.chunk, args.games)))

    if args.retries > 0:
        _supervise(args, n_chunks)
        return

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

    from gymgo_tpu.utils import faulttol

    ledger = faulttol.load_ledger(args.state_file)
    wins = losses = ties = unfinished = 0
    swins = slosses = 0
    for ci in range(n_chunks):
        rec = ledger.get(str(ci))
        if rec is None:
            res = run_chunk(jax.random.fold_in(
                jax.random.PRNGKey(args.seed), ci))
            rec = {"wins": int(res.policy_a_wins),
                   "losses": int(res.policy_b_wins),
                   "ties": int(res.ties),
                   "unfinished": int(res.unfinished),
                   "scored_wins": int(res.a_scored_wins),
                   "scored_losses": int(res.b_scored_wins)}
            if args.state_file:
                faulttol.append_chunk(args.state_file, str(ci), rec)
        wins += rec["wins"]
        losses += rec["losses"]
        ties += rec["ties"]
        unfinished += rec["unfinished"]
        # ledgers written before area adjudication lack the scored fields;
        # fall back to finished-games tallies for those chunks
        swins += rec.get("scored_wins", rec["wins"])
        slosses += rec.get("scored_losses", rec["losses"])
        if n_chunks > 1:
            print(f"  chunk {ci + 1}/{n_chunks}: cumulative "
                  f"{wins}W/{losses}L/{ties}T "
                  f"({unfinished} unfinished)", flush=True)
    _report(args, b_name, wins, losses, ties, unfinished, swins, slosses)


def _report(args, b_name, wins, losses, ties, unfinished,
            scored_wins=None, scored_losses=None):
    finished = max(wins + losses + ties, 1)
    line = (f"{args.ckpt} (gumbel-{args.sims}"
            + (f", open-{args.opening_moves}" if args.opening_moves else "")
            + f") vs {b_name}: {wins}W/{losses}L/{ties}T, "
            f"{unfinished} unfinished, winrate={wins / finished:.3f}")
    if unfinished and scored_wins is not None:
        # unfinished games adjudicated by Trump-Taylor area at the cap
        total = wins + losses + ties + unfinished
        line += (f"; area-adjudicated {scored_wins}W/{scored_losses}L, "
                 f"winrate={scored_wins / max(total, 1):.3f}")
    print(line)


def _supervise(args, n_chunks):
    """Run this script as a supervised child (see module docstring).

    Deliberately imports no jax here — a wedged tunnel must not be able
    to hang the supervisor."""
    from gymgo_tpu.utils import faulttol

    state_file = args.state_file
    if not state_file:
        tag = hashlib.sha1(" ".join(sys.argv[1:]).encode()).hexdigest()[:12]
        os.makedirs("logs", exist_ok=True)
        state_file = f"logs/evalstate_{tag}.jsonl"
    prior = faulttol.load_ledger(state_file)
    if prior:
        print(f"[eval] resuming: {len(prior)} completed chunk(s) in "
              f"{state_file}", flush=True)

    child = [sys.executable, os.path.abspath(__file__)]
    skip_next = False
    for a in sys.argv[1:]:
        if skip_next:
            skip_next = False
            continue
        if a in ("--retries", "--state-file"):
            skip_next = True
            continue
        if a.startswith(("--retries=", "--state-file=")):
            continue
        child.append(a)
    child += ["--retries", "0", "--state-file", state_file]

    ledger = faulttol.supervise(
        child, state_file,
        expected_chunks=[str(i) for i in range(n_chunks)],
        max_retries=args.retries,
        child_timeout_s=args.child_timeout,
        cpu_probe=args.cpu,
    )
    wins = sum(ledger[str(i)]["wins"] for i in range(n_chunks))
    losses = sum(ledger[str(i)]["losses"] for i in range(n_chunks))
    ties = sum(ledger[str(i)]["ties"] for i in range(n_chunks))
    unfinished = sum(ledger[str(i)]["unfinished"] for i in range(n_chunks))
    swins = sum(ledger[str(i)].get("scored_wins", ledger[str(i)]["wins"])
                for i in range(n_chunks))
    slosses = sum(ledger[str(i)].get("scored_losses",
                                     ledger[str(i)]["losses"])
                  for i in range(n_chunks))
    _report(args, args.opp_ckpt or "uniform-random",
            wins, losses, ties, unfinished, swins, slosses)


if __name__ == "__main__":
    main()
