"""Headline benchmark: batched 19x19 env-steps/s on one chip.

Protocol (BASELINE.json configs[2]): 19x19 board, 4096 lockstep envs,
heuristic reward (Trump-Taylor area scoring every step), auto-reset,
uniform-random legal policy, `lax.scan` rollout with zero host round-trips.
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
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--reward", default="heuristic")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.env import BatchGoEnv

    dev = jax.devices()[0]
    log(f"backend={jax.default_backend()} device={dev.device_kind}")

    cfg = EnvConfig(
        board_size=args.board,
        batch_size=args.batch,
        reward_method=args.reward,
        auto_reset=True,
    )
    env = BatchGoEnv(cfg)
    key = jax.random.PRNGKey(0)

    states = env.reset()
    log("compiling rollout ...")
    t0 = time.perf_counter()
    r = env.rollout(key, states, args.steps)
    jax.block_until_ready(r.final_states)
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    best = float("inf")
    for i in range(args.repeats):
        states = env.reset()
        jax.block_until_ready(states)
        t0 = time.perf_counter()
        r = env.rollout(key, states, args.steps)
        jax.block_until_ready(r.final_states)
        dt = time.perf_counter() - t0
        log(f"run {i}: {dt:.3f}s  ({args.batch * args.steps / dt:,.0f} steps/s)")
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


if __name__ == "__main__":
    main()
