"""Headline benchmark: batched 19x19 env-steps/s on one chip.

Protocol (BASELINE.json configs[2]): 19x19 board, 12288 lockstep envs
(batch-size sweep in BENCHMARKS.md: 12288 is the measured throughput
optimum on v5e — 4096/8192/10240/14336/16384 are all slower),
heuristic reward (Trump-Taylor area scoring every step), auto-reset,
uniform-random legal policy, `lax.scan` rollout with zero host round-trips.
The measured window starts from a *steady-state* population (after a warmup
rollout long enough for games to reach mid/late-game densities and recycle),
so flood-fill trip counts reflect realistic boards, not empty ones.

Timing fetches a scalar checksum of the rollout outputs: on the tunneled
TPU backend `block_until_ready` alone does not reliably wait, and this also
keeps device->host traffic out of the measured window.

North-star target: >= 1,000,000 env-steps/s/chip (the reference publishes no
numbers of its own — BASELINE.md); ``vs_baseline`` reports value / 1e6.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--board", type=int, default=19)
    ap.add_argument("--batch", type=int, default=12288)
    ap.add_argument("--steps", type=int, default=64, help="timed rollout length")
    ap.add_argument("--warmup-steps", type=int, default=768,
                    help="steady-state warmup rollout length")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--reward", default="heuristic")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache (same knob as train.py).  Root-cause of
    # BENCH_r02's 1211s "compile+first run" (vs 36s in round 1), measured:
    # the LOCAL XLA compile of this program is 2.9s — the wait is the
    # REMOTE side of the axon tunnel compiling/queueing at first execution,
    # with enormous variance (same program, same day: 545s / 124s / 566s;
    # a small 9x9 probe: 68s cold vs 361s with a local cache HIT).  A local
    # cache hit deserializes the executable but does NOT skip the remote
    # work, so no client-side change can bound the first run.  The cache is
    # still enabled for the parts it does help (CPU runs, small host-side
    # jits).  Opt out with GYMGO_COMPILE_CACHE=0.
    cache = os.environ.get("GYMGO_COMPILE_CACHE", "~/.cache/gymgo_jax")
    if cache not in ("0", ""):
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser(cache)
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.env.batch_env import rollout

    dev = jax.devices()[0]
    log(f"backend={jax.default_backend()} device={dev.device_kind}")

    cfg = EnvConfig(
        board_size=args.board,
        batch_size=args.batch,
        reward_method=args.reward,
        auto_reset=True,
    )

    @jax.jit
    def timed(key, states):
        r = rollout(key, states, args.steps, cfg)
        checksum = jnp.sum(r.final_states.astype(jnp.int32)) + jnp.sum(r.rewards)
        return r.final_states, checksum

    key = jax.random.PRNGKey(0)
    states = batch_init_state(args.batch, args.board)

    log("compiling rollout ...")
    t0 = time.perf_counter()
    states, c = timed(key, states)
    float(c)
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    # Reach steady-state board population by iterating the SAME compiled
    # program (a separate long-scan warmup would recompile).
    chunks = max(0, (args.warmup_steps - args.steps) // args.steps)
    log(f"warmup: {chunks} x {args.steps} steps ...")
    t0 = time.perf_counter()
    for i in range(chunks):
        states, c = timed(jax.random.fold_in(key, 1000 + i), states)
    float(c)
    stones = int(jnp.sum(states[:, :2].astype(jnp.int32)))
    log(f"warmup done in {time.perf_counter() - t0:.1f}s; "
        f"mean stones/board={stones / args.batch:.1f}")

    best = float("inf")
    for i in range(args.repeats):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        _, c = timed(k, states)
        float(c)  # fetch forces completion over the tunnel
        dt = time.perf_counter() - t0
        log(f"run {i}: {dt:.4f}s  ({args.batch * args.steps / dt:,.0f} steps/s)")
        best = min(best, dt)

    steps_per_sec = args.batch * args.steps / best
    print(
        json.dumps(
            {
                "metric": f"env_steps_per_sec_per_chip_{args.board}x{args.board}",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(steps_per_sec / 1_000_000, 4),
            }
        )
    )


def _resilient_main():
    # The tunneled TPU backend can fail transiently (relay reconnects);
    # one retry keeps driver-run benchmarks from false-negative crashes.
    try:
        main()
    except Exception as e:  # pragma: no cover
        log(f"bench attempt failed ({type(e).__name__}: {e}); retrying in 60s")
        time.sleep(60)
        main()


if __name__ == "__main__":
    _resilient_main()
