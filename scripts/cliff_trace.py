"""jax.profiler trace of ONE Gumbel decision at a given batch size.

Attempts a device trace through the axon relay (may capture host-only;
the companion ablation is the fallback).  Writes the trace under
logs/trace_B{batch}/ and prints the largest device-time ops if the
trace contains any (parsed from the .trace.json.gz event dump).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--board", type=int, default=19)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--sims", type=int, default=32)
    ap.add_argument("--gumbel-m", type=int, default=16)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.env.batch_env import rollout
    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.models import AZNet, AZNetConfig, init_params
    from gymgo_tpu.rl import make_gumbel_mcts_policy

    n, b = args.board, args.batch
    cfg = EnvConfig(board_size=n, batch_size=b)
    netcfg = AZNetConfig(board_size=n, channels=args.channels,
                         blocks=args.blocks)
    net = AZNet(netcfg)
    params = init_params(jax.random.PRNGKey(0), netcfg)
    policy = make_gumbel_mcts_policy(
        params, net.apply, num_simulations=args.sims,
        max_considered=args.gumbel_m)

    # mid-game boards (empty boards understate every cost)
    states = rollout(jax.random.PRNGKey(1), batch_init_state(b, n),
                     60, cfg).final_states
    decide = jax.jit(policy)
    key = jax.random.PRNGKey(2)
    acts = decide(key, states)  # compile + warm
    _ = int(jax.numpy.sum(acts))  # fence via scalar fetch (tunnel-safe)

    outdir = f"logs/trace_B{b}"
    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        acts = decide(jax.random.fold_in(key, 1), states)
        _ = int(jax.numpy.sum(acts))
    print(f"trace written to {outdir}", flush=True)

    # summarize device events if any
    files = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace json found (relay likely host-only)")
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes are process names like "/device:TPU:0" or "TPU"
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, nm in pid_names.items()
                if "TPU" in nm.upper() or "device" in nm.lower()}
    from collections import defaultdict
    tot = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tot[e.get("name", "?")] += e.get("dur", 0.0)
    if not tot:
        print(f"trace {path}: no device-lane events "
              f"(processes: {sorted(pid_names.values())[:8]})")
        return
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:20]
    print(f"top device ops by total us (B={b}):")
    for name, us in top:
        print(f"  {us:12.0f} us  {name[:100]}")


if __name__ == "__main__":
    main()
