"""MCTS search throughput on TPU: batched root decisions per second.

The AZ self-play hot path is run_mcts (PUCT, exact env dynamics) /
run_gumbel_mcts (sequential halving).  This measures complete searches per
second (root decisions/s) and simulations/s at production-ish settings,
with the tunnel-safe scalar-fetch timing used everywhere else.

Usage: timeout 580 python benchmarks/mcts_bench.py [--board 19 --batch 256
       --sims 32 --par 8 --channels 64 --blocks 3] [--search puct|gumbel]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--board", type=int, default=19)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--sims", type=int, default=32)
    ap.add_argument("--par", type=int, default=8)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--search", choices=["puct", "gumbel", "both"],
                    default="both")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--batch-sweep", default="",
                    help="comma-separated batch sizes; runs the selected "
                         "search at each and prints a decisions/s-vs-batch "
                         "table with per-env degradation vs the smallest "
                         "(the step got the same sweep — BENCHMARKS.md)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.batch_sweep:
        batches = [int(x) for x in args.batch_sweep.split(",")]
        assert args.search in ("puct", "gumbel"), "--batch-sweep needs one search"
        rows = []
        for bsz in batches:
            sub = [sys.executable, os.path.abspath(__file__),
                   "--board", str(args.board), "--batch", str(bsz),
                   "--sims", str(args.sims), "--par", str(args.par),
                   "--channels", str(args.channels),
                   "--blocks", str(args.blocks),
                   "--search", args.search, "--repeats", str(args.repeats)] \
                  + (["--cpu"] if args.cpu else [])
            import subprocess
            out = subprocess.run(sub, capture_output=True, text=True,
                                 timeout=3600)
            import json
            jline = [ln for ln in out.stdout.splitlines()
                     if ln.startswith("BENCHJSON ")]
            if not jline:
                log(f"B={bsz} FAILED (no BENCHJSON line):\n"
                    f"{out.stderr[-2000:]}")
                continue
            rec = json.loads(jline[0][len("BENCHJSON "):])
            ms = float(rec["ms_per_search"])
            rows.append((bsz, ms))
            log(f"B={bsz}: {ms:.1f} ms/search, "
                f"{rec['decisions_per_s']:,.0f} decisions/s")
        if rows:
            b0, ms0 = rows[0]
            print(f"{args.search} {args.board}x{args.board} {args.sims} sims "
                  f"({args.channels}ch x {args.blocks}): batch sweep")
            print("| B | ms/search | decisions/s | ms/env | degradation vs "
                  f"B={b0} |")
            print("|---|---|---|---|---|")
            for bsz, ms in rows:
                print(f"| {bsz} | {ms:.1f} | {bsz / ms * 1e3:,.0f} | "
                      f"{ms / bsz:.3f} | {ms / bsz / (ms0 / b0):.2f}x |")
        return

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.env.batch_env import rollout
    from gymgo_tpu.models import AZNet, AZNetConfig, init_params

    n, b = args.board, args.batch
    netcfg = AZNetConfig(board_size=n, channels=args.channels,
                         blocks=args.blocks)
    net = AZNet(netcfg)
    params = init_params(jax.random.PRNGKey(0), netcfg)
    cfg = EnvConfig(board_size=n, batch_size=b, auto_reset=True)

    # mid-game boards (searches over empty boards overstate throughput)
    @jax.jit
    def warm(key, states):
        r = rollout(key, states, 64, cfg)
        return r.final_states, jnp.sum(r.rewards)

    key = jax.random.PRNGKey(1)
    states = batch_init_state(b, n)
    for i in range(2):
        states, c = warm(jax.random.fold_in(key, i), states)
    float(c)
    log(f"backend={jax.default_backend()} boards warmed "
        f"(mean stones {float(jnp.sum(states[:, :2])) / b:.0f})")

    results = {}

    if args.search in ("puct", "both"):
        from gymgo_tpu.rl.mcts import run_mcts

        @jax.jit
        def puct(key, states):
            res = run_mcts(key, states, params, net.apply,
                           num_simulations=args.sims,
                           num_parallel=args.par)
            return res.actions, jnp.sum(res.root_visits)

        _, c = puct(key, states)
        float(c)
        best = float("inf")
        for i in range(args.repeats):
            t0 = time.perf_counter()
            _, c = puct(jax.random.fold_in(key, 10 + i), states)
            float(c)
            best = min(best, time.perf_counter() - t0)
        results["puct"] = best

    if args.search in ("gumbel", "both"):
        from gymgo_tpu.rl.gumbel_mcts import run_gumbel_mcts

        @jax.jit
        def gumbel(key, states):
            res = run_gumbel_mcts(key, states, params, net.apply,
                                  num_simulations=args.sims)
            return res.actions, jnp.sum(res.root_visits)

        _, c = gumbel(key, states)
        float(c)
        best = float("inf")
        for i in range(args.repeats):
            t0 = time.perf_counter()
            _, c = gumbel(jax.random.fold_in(key, 20 + i), states)
            float(c)
            best = min(best, time.perf_counter() - t0)
        results["gumbel"] = best

    for name, dt in results.items():
        print(f"{name}: {b / dt:,.0f} root decisions/s  "
              f"({b * args.sims / dt:,.0f} sims/s; {dt * 1e3:.1f} ms per "
              f"{b}-env search, {args.sims} sims"
              + (f", par={args.par}" if name == "puct" else "") + ")")
        # machine-readable line for --batch-sweep (and any other harness):
        # parsing the human format silently breaks when it changes
        import json
        print("BENCHJSON " + json.dumps(
            {"search": name, "batch": b, "sims": args.sims,
             "ms_per_search": dt * 1e3, "decisions_per_s": b / dt}))


if __name__ == "__main__":
    main()
