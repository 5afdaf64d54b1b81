"""Round-robin Elo ladder over checkpoint engines, through the GTP stack.

Plays every pairing of the given players (colors alternating) with
scripts/gtp_match.play_game, then fits Bradley-Terry strengths by the
standard minorization-maximization iteration and reports them on the Elo
scale anchored at the first player (use `random` first for an absolute
anchor).  Ties and truncated games count as half a win each; a half
virtual draw against every opponent regularizes perfect scores to finite
ratings.

Usage:
  python scripts/elo_ladder.py --boardsize 7 --games 8 \
      --player random --player iter120=net:ck/iter120.npz:32 \
      --player iter240=net:ck/iter240.npz:32

Output: a markdown ladder table + the pairwise win matrix (paste into
BENCHMARKS.md).  The reference ships no tooling like this (its only match
loop is demo.py's human-vs-random, /root/reference/demo.py:14-24); this is
the framework's checkpoint-strength yardstick.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gtp_match  # noqa: E402


def fit_elo(names, wins, games, anchor=0.0):
    """Bradley-Terry MM fit.  ``wins[i][j]`` = i's win count vs j (ties
    pre-split as 0.5 each side); ``games[i][j]`` = games between i and j.
    Returns Elo ratings with player 0 pinned to ``anchor``."""
    k = len(names)
    # half a virtual draw vs every opponent: keeps 100% scores finite.
    w = [[wins[i][j] + (0.25 if i != j else 0.0) for j in range(k)] for i in range(k)]
    n = [[games[i][j] + (0.5 if i != j else 0.0) for j in range(k)] for i in range(k)]
    p = [1.0] * k
    for _ in range(2000):
        newp = []
        for i in range(k):
            wi = sum(w[i][j] for j in range(k) if j != i)
            denom = sum(
                n[i][j] / (p[i] + p[j]) for j in range(k) if j != i and n[i][j] > 0
            )
            newp.append(wi / denom if denom > 0 else p[i])
        scale = sum(newp) / k
        newp = [x / scale for x in newp]
        delta = max(abs(a - b) for a, b in zip(newp, p))
        p = newp
        if delta < 1e-12:
            break
    elo = [400.0 / math.log(10.0) * math.log(x) for x in p]
    shift = anchor - elo[0]
    return [e + shift for e in elo]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--boardsize", type=int, default=7)
    ap.add_argument("--komi", type=float, default=0.0)
    ap.add_argument("--games", type=int, default=8,
                    help="total games per pair, colors alternating")
    ap.add_argument("--player", action="append", required=True,
                    help="NAME=SPEC or bare SPEC (spec syntax of gtp_match)")
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--gumbel-m", type=int, default=16)
    ap.add_argument("--batched", action="store_true",
                    help="play each pairing as ONE batched on-device match "
                         "(rl.evaluate.play_match: --games lockstep games, "
                         "colors alternating by game index) instead of "
                         "sequential GTP games — the TPU-speed path for "
                         "big-board ladders; truncated games count as ties "
                         "like the GTP path")
    ap.add_argument("--opening-moves", type=int, default=0,
                    help=">0 (--batched only): force the first k plies to "
                         "random board moves shared within each "
                         "color-swapped pair — opening diversity so the "
                         "ladder measures strength, not empty-board style "
                         "lock (the measured cause-candidate for the 13x13 "
                         "non-transitivity, BENCHMARKS.md)")
    ap.add_argument("--chunk", type=int, default=128,
                    help="--batched: max games per device batch; larger "
                         "--games totals run as aggregated chunks (the "
                         "19x19 two-net eval kernel-faulted at one "
                         "256-game batch)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--retries", type=int, default=2,
                    help="--batched: max child relaunches after a TPU "
                         "worker crash (supervised per-chunk ledger, as "
                         "in eval_ckpt.py); 0 = bare single process")
    ap.add_argument("--state-file", default="",
                    help="JSONL chunk ledger; auto-derived under logs/ "
                         "when --retries > 0 and unset")
    ap.add_argument("--child-timeout", type=float, default=5400.0)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    names, specs = [], []
    for i, entry in enumerate(args.player):
        if "=" in entry and not entry.split("=")[0].startswith("net:"):
            name, spec = entry.split("=", 1)
        else:
            name, spec = entry, entry
        names.append(name)
        specs.append(spec)
    k = len(names)
    if k < 2:
        raise SystemExit("need at least two --player entries")

    if args.batched:
        if args.retries > 0:
            _supervise_batched(args, names)
            return
        wins, games, truncated = _batched_round_robin(args, names, specs)
        _report(args, names, wins, games, truncated)
        return

    engines = [
        gtp_match.build_engine(spec, args.boardsize, args.komi,
                               args.seed + i, args.channels, args.blocks)
        for i, spec in enumerate(specs)
    ]
    max_moves = 3 * args.boardsize * args.boardsize

    wins = [[0.0] * k for _ in range(k)]
    games = [[0] * k for _ in range(k)]
    truncated = 0
    for i in range(k):
        for j in range(i + 1, k):
            for g in range(args.games):
                i_is_black = g % 2 == 0
                black, white = (engines[i], engines[j]) if i_is_black else (
                    engines[j], engines[i])
                r, finished = gtp_match.play_game(
                    black, white, args.boardsize, max_moves)
                if not finished:
                    truncated += 1
                    r = 0.0  # score a truncation as a tie, not by mid-game area
                i_signed = r if i_is_black else -r
                games[i][j] += 1
                games[j][i] += 1
                if i_signed > 0:
                    wins[i][j] += 1.0
                elif i_signed < 0:
                    wins[j][i] += 1.0
                else:
                    wins[i][j] += 0.5
                    wins[j][i] += 0.5
                print(f"{names[i]} vs {names[j]} game {g}: "
                      f"{'+' if i_signed > 0 else '-' if i_signed < 0 else '='}"
                      f"{' (truncated)' if not finished else ''}", flush=True)

    _report(args, names, wins, games, truncated)


def _batched_round_robin(args, names, specs):
    """All pairings as batched on-device matches.  One jitted program per
    (sims_a, sims_b) signature — params are traced, so every net-vs-net
    pair reuses the same compiled match regardless of checkpoint."""
    import functools

    import jax

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core.actions import uniform_random_actions
    from gymgo_tpu.models import AZNet, AZNetConfig, init_params
    from gymgo_tpu.rl import (
        make_gumbel_mcts_policy, play_match, with_pass_to_win,
    )
    from gymgo_tpu.utils import checkpoint as ckpt

    netcfg = AZNetConfig(board_size=args.boardsize, channels=args.channels,
                         blocks=args.blocks)
    net = AZNet(netcfg)
    dummy = init_params(jax.random.PRNGKey(0), netcfg)

    def parse(spec):
        """-> (params, sims); sims=0 marks the uniform-random player."""
        if spec == "random":
            return dummy, 0
        if not spec.startswith("net:"):
            raise SystemExit(f"--batched supports specs random / "
                             f"net:CKPT[:SIMS], got {spec!r}")
        parts = spec.split(":")
        sims = int(parts[2]) if len(parts) > 2 else 32
        tmpl = {"params": init_params(jax.random.PRNGKey(0), netcfg)}
        return ckpt.restore_npz(parts[1], tmpl)["params"], sims

    players = [parse(s) for s in specs]
    chunk = min(args.chunk, args.games)
    cfg = EnvConfig(board_size=args.boardsize, batch_size=chunk,
                    komi=args.komi, auto_reset=False)
    max_moves = 3 * args.boardsize * args.boardsize

    def policy(params, sims):
        if sims == 0:
            return lambda kk, s: uniform_random_actions(kk, s)
        return with_pass_to_win(make_gumbel_mcts_policy(
            params, net.apply, num_simulations=sims,
            max_considered=args.gumbel_m, komi=args.komi,
            pass_min_stones=1 << 20), komi=args.komi)

    @functools.partial(jax.jit, static_argnames=("sims_a", "sims_b"))
    def match(key, pa, pb, sims_a, sims_b):
        return play_match(key, policy(pa, sims_a), policy(pb, sims_b),
                          cfg, num_games=chunk, max_steps=max_moves,
                          opening_moves=args.opening_moves)

    from gymgo_tpu.utils import faulttol

    ledger = faulttol.load_ledger(args.state_file)
    k = len(names)
    wins = [[0.0] * k for _ in range(k)]
    games = [[0] * k for _ in range(k)]
    truncated = 0
    n_chunks = max(1, -(-args.games // chunk))
    for i in range(k):
        for j in range(i + 1, k):
            (pa, sa), (pb, sb) = players[i], players[j]
            aw = bw = tie = trunc = 0
            for ci in range(n_chunks):
                ck = f"i{i}-j{j}-c{ci}"
                rec = ledger.get(ck)
                if rec is None:
                    # chunk key derived from (seed, i, j, ci), never from
                    # sequential split state — a redone chunk replays the
                    # exact same games (faulttol resume contract)
                    sub = jax.random.fold_in(jax.random.fold_in(
                        jax.random.fold_in(
                            jax.random.PRNGKey(args.seed), i), j), ci)
                    res = match(sub, pa, pb, sa, sb)
                    # truncated games are adjudicated by Trump-Taylor
                    # area at the move cap (rl/evaluate.py scored
                    # tallies) — between near-equal nets over half the
                    # games can truncate, and counting them as ties
                    # compresses real rating gaps
                    rec = {"aw": int(res.a_scored_wins),
                           "bw": int(res.b_scored_wins),
                           "tie": int(res.scored_ties),
                           "trunc": int(res.unfinished)}
                    if args.state_file:
                        faulttol.append_chunk(args.state_file, ck, rec)
                aw += rec["aw"]
                bw += rec["bw"]
                tie += rec["tie"]
                trunc += rec["trunc"]
            truncated += trunc
            total = aw + bw + tie
            wins[i][j] += aw + 0.5 * tie
            wins[j][i] += bw + 0.5 * tie
            games[i][j] += total
            games[j][i] += total
            print(f"{names[i]} vs {names[j]}: {aw}W/{bw}L/{tie}T "
                  f"({trunc} truncated)", flush=True)
    return wins, games, truncated


def _supervise_batched(args, names):
    """Supervised --batched ladder (see eval_ckpt.py): per-chunk JSONL
    ledger + relaunch-after-crash.  No jax import in this process."""
    import hashlib

    from gymgo_tpu.utils import faulttol

    state_file = args.state_file
    if not state_file:
        tag = hashlib.sha1(" ".join(sys.argv[1:]).encode()).hexdigest()[:12]
        os.makedirs("logs", exist_ok=True)
        state_file = f"logs/ladderstate_{tag}.jsonl"
    prior = faulttol.load_ledger(state_file)
    if prior:
        print(f"[ladder] resuming: {len(prior)} completed chunk(s) in "
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

    k = len(names)
    chunk = min(args.chunk, args.games)
    n_chunks = max(1, -(-args.games // chunk))
    expected = [f"i{i}-j{j}-c{ci}"
                for i in range(k) for j in range(i + 1, k)
                for ci in range(n_chunks)]
    ledger = faulttol.supervise(
        child, state_file, expected_chunks=expected,
        max_retries=args.retries, child_timeout_s=args.child_timeout,
        cpu_probe=args.cpu,
    )
    wins = [[0.0] * k for _ in range(k)]
    games = [[0] * k for _ in range(k)]
    truncated = 0
    for i in range(k):
        for j in range(i + 1, k):
            aw = sum(ledger[f"i{i}-j{j}-c{ci}"]["aw"] for ci in range(n_chunks))
            bw = sum(ledger[f"i{i}-j{j}-c{ci}"]["bw"] for ci in range(n_chunks))
            tie = sum(ledger[f"i{i}-j{j}-c{ci}"]["tie"] for ci in range(n_chunks))
            truncated += sum(
                ledger[f"i{i}-j{j}-c{ci}"]["trunc"] for ci in range(n_chunks))
            total = aw + bw + tie
            wins[i][j] += aw + 0.5 * tie
            wins[j][i] += bw + 0.5 * tie
            games[i][j] += total
            games[j][i] += total
    _report(args, names, wins, games, truncated)


def _report(args, names, wins, games, truncated):
    k = len(names)
    elo = fit_elo(names, wins, games)
    order = sorted(range(k), key=lambda i: -elo[i])
    print("\n| player | games | score | Elo |")
    print("|---|---|---|---|")
    for i in order:
        tot = sum(games[i][j] for j in range(k))
        sc = sum(wins[i][j] for j in range(k))
        print(f"| {names[i]} | {tot} | {sc:.1f} | {elo[i]:+.0f} |")
    print("\npairwise wins (row beats column):")
    header = " | ".join(f"{nm:>10}" for nm in names)
    print(f"{'':>10} | {header}")
    for i in range(k):
        row = " | ".join(
            f"{wins[i][j]:>10.1f}" if j != i else f"{'-':>10}" for j in range(k)
        )
        print(f"{names[i]:>10} | {row}")
    if truncated:
        # batched path: adjudicated by area at the cap (rl/evaluate.py
        # scored tallies); GTP path: counted as ties
        print(f"\ntruncated games (area-adjudicated in batched mode): "
              f"{truncated}")


if __name__ == "__main__":
    main()
