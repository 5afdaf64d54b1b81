"""Microbenchmark: classification bundle flood variants on steady-state boards.

Times ONE flood over a (B, N, N) steady-state batch (captured by a short
warmup rollout) for each variant.  Guards against the constant-input
hoisting pitfall (BENCHMARKS.md) by cycling through R distinct board
batches captured at different rollout depths — each timed call sees a
different input, and timing fetches a scalar checksum.

Usage: timeout 900 python scripts/flood_microbench.py --variants bitpack,pallas:64,pallas:256
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
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--warmup-steps", type=int, default=768)
    ap.add_argument("--snapshots", type=int, default=8)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--variants", default="bitpack,pallas:64,pallas:256")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.env.batch_env import rollout
    from gymgo_tpu.core import flood as F
    from gymgo_tpu.ops import pallas_flood as PF
    from gymgo_tpu import govars

    n, b = args.board, args.batch
    cfg = EnvConfig(board_size=n, batch_size=b, reward_method="heuristic",
                    auto_reset=True)

    @jax.jit
    def warm(key, states):
        r = rollout(key, states, 64, cfg)
        return r.final_states, jnp.sum(r.rewards)

    key = jax.random.PRNGKey(0)
    states = batch_init_state(b, n)
    t0 = time.perf_counter()
    states, c = warm(key, states)
    float(c)
    log(f"compile+warm {time.perf_counter()-t0:.1f}s; backend={jax.default_backend()}")
    snaps = []
    for i in range((args.warmup_steps - 64) // 64):
        states, c = warm(jax.random.fold_in(key, i), states)
        if i >= (args.warmup_steps - 64) // 64 - args.snapshots:
            snaps.append((states[:, govars.BLACK].astype(jnp.bool_),
                          states[:, govars.WHITE].astype(jnp.bool_)))
    float(c)
    log(f"{len(snaps)} steady-state snapshots captured "
        f"({time.perf_counter()-t0:.1f}s)")

    # Stack snapshots and scan the flood over them INSIDE one jit: one
    # device fetch times S floods over S distinct inputs (no CSE, no
    # constant hoisting, tunnel round-trip amortized).  Snapshots are
    # tiled --passes times (scan re-executes per slice even for repeated
    # values), and a null variant measures the fetch/scan floor to report
    # overhead-corrected numbers.
    stack_a = jnp.stack([s[0] for s in snaps])
    stack_w = jnp.stack([s[1] for s in snaps])
    passes = int(os.environ.get("FLOOD_BENCH_PASSES", "8"))
    stack_a = jnp.tile(stack_a, (passes, 1, 1, 1))
    stack_w = jnp.tile(stack_w, (passes, 1, 1, 1))
    snaps = snaps * passes

    def make_fn(spec):
        if spec == "null":
            one = lambda a, w: a.astype(jnp.int32).sum() + w.astype(jnp.int32).sum()
        elif spec == "bitpack":
            one = lambda a, w: F.flood_bundle_bitpack(a, w, n)[0].astype(jnp.int32).sum()
        elif spec.startswith("pallas"):
            parts = spec.split(":")
            tile = int(parts[1]) if len(parts) > 1 else 16
            unroll = int(parts[2]) if len(parts) > 2 else 4
            one = lambda a, w: PF.bundle_flood_pallas(
                a, w, tile=tile, unroll=unroll).sum()
        elif spec.startswith("gatepack"):
            one = lambda a, w: F.flood_bundle_gatepack(a, w, n)[0].astype(jnp.int32).sum()
        else:
            raise ValueError(spec)

        @jax.jit
        def scan_all(sa, sw):
            def body(acc, xs):
                a, w = xs
                return acc + one(a, w), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), (sa, sw))
            return acc

        return scan_all

    results = {}
    for spec in args.variants.split(","):
        fn = make_fn(spec)
        float(fn(stack_a, stack_w))  # compile
        t0 = time.perf_counter()
        acc = 0.0
        reps = max(1, args.iters // len(snaps))
        for _ in range(reps):
            acc += float(fn(stack_a, stack_w))
        dt = (time.perf_counter() - t0) / (reps * len(snaps))
        results[spec] = dt
        log(f"{spec:14s} {dt*1e3:8.3f} ms/flood  (checksum {acc:.0f})")

    base = results.get("bitpack")
    for spec, dt in results.items():
        rel = f"  {base/dt:.2f}x vs bitpack" if base else ""
        print(f"{spec:14s} {dt*1e3:8.3f} ms{rel}")


if __name__ == "__main__":
    main()
