"""Multi-host scaling proxies on ONE machine (no pod-slice hardware here).

The ≥90%-linear host-scaling target (BASELINE.md:16) is only truly
measurable on a real TPU pod slice.  What IS measurable on one box — and
is recorded into BENCHMARKS.md — are the two overheads that could break
linearity, isolated by holding TOTAL hardware and TOTAL envs fixed so CPU
oversubscription cannot masquerade as distribution cost:

  1. ``--mode mesh``: one process, fixed total envs, the env axis sharded
     over 1/2/4/8 virtual CPU devices.  Measures mesh/sharding overhead
     (partitioning, per-shard dispatch) of the collective-free step.
  2. ``--mode procs``: the SAME global rollout (same total envs, same
     total virtual devices) run via ``jax.distributed`` with 1 process
     owning all devices vs 2 processes owning half each.  Adds the real
     multi-host mechanics: process bootstrap, cross-process mesh, global
     array assembly, and the replicated checksum fetch.

Aggregate-throughput efficiency ≈ 1.0 across a sweep supports (but — pod
caveat — does not prove) the design claim that host scaling is linear
because the step has no collective on the critical path
(parallel/mesh.py docstring; scripts/multihost_bench.py is the pod entry
point when hardware exists).

Usage:  python scripts/scaling_proxy.py --mode mesh
        python scripts/scaling_proxy.py --mode procs
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULTS = dict(board=9, envs=512, steps=32, warmup=96, repeats=3)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _timed_rollout(env, envs, steps, warmup, repeats):
    """Best-of-``repeats`` aggregate env-steps/s of a jitted global rollout."""
    import jax
    import jax.numpy as jnp

    states = env.reset()
    key = jax.random.PRNGKey(0)
    done_warm = 0
    while done_warm < warmup:  # reuse the compiled (steps,) program
        r = env.rollout(jax.random.fold_in(key, 7000 + done_warm), states, steps)
        states = r.final_states
        done_warm += steps
    float(jnp.sum(r.rewards))  # fetch = completion barrier
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        r = env.rollout(jax.random.fold_in(key, i), states, steps)
        float(jnp.sum(r.rewards))
        best = min(best, time.perf_counter() - t0)
    return envs * steps / best


def run_mesh_mode(args):
    """One process; env axis over 1/2/4/8 virtual devices, total envs fixed."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.parallel import ShardedGoEnv, make_mesh

    cfg = EnvConfig(board_size=args.board, batch_size=args.envs,
                    reward_method="heuristic", auto_reset=True)
    rows = []
    for d in (1, 2, 4, 8):
        mesh = make_mesh(devices=jax.devices()[:d])
        env = ShardedGoEnv(cfg, mesh)
        sps = _timed_rollout(env, args.envs, args.steps, args.warmup,
                             args.repeats)
        rows.append({"devices": d, "env_steps_per_sec": round(sps)})
        print(f"devices={d}: {sps:,.0f} env-steps/s", file=sys.stderr)
    base = rows[0]["env_steps_per_sec"]
    for r in rows:
        r["efficiency_vs_1dev"] = round(r["env_steps_per_sec"] / base, 3)
    print(json.dumps({"mode": "mesh", "board": args.board,
                      "total_envs": args.envs, "rows": rows}))


def run_procs_mode(args):
    """Same global rollout with 1 vs 2 processes over the same 4 devices."""
    results = {}
    for n_proc in (1, 2):
        port = _free_port()
        local_dev = 4 // n_proc
        procs = []
        for pid in range(n_proc):
            env = dict(os.environ)
            env.pop("JAX_PLATFORMS", None)
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={local_dev}"
            )
            procs.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--role", "worker",
                 "--coordinator", f"localhost:{port}",
                 "--num-processes", str(n_proc), "--process-id", str(pid),
                 "--board", str(args.board), "--envs", str(args.envs),
                 "--steps", str(args.steps), "--warmup", str(args.warmup),
                 "--repeats", str(args.repeats)],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
                text=True,
            ))
        out, _ = procs[0].communicate(timeout=1200)
        for p in procs[1:]:
            p.wait(timeout=60)
        assert all(p.returncode == 0 for p in procs), "worker failed"
        results[n_proc] = json.loads(out.strip().splitlines()[-1])
        print(f"{n_proc} process(es): "
              f"{results[n_proc]['env_steps_per_sec']:,} env-steps/s",
              file=sys.stderr)
    eff = (results[2]["env_steps_per_sec"]
           / results[1]["env_steps_per_sec"])
    print(json.dumps({
        "mode": "procs", "board": args.board, "total_envs": args.envs,
        "total_devices": 4, "rows": [results[1], results[2]],
        "efficiency_2proc_vs_1proc": round(eff, 3),
    }))


def run_worker(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.parallel import ShardedGoEnv, make_mesh

    cfg = EnvConfig(board_size=args.board, batch_size=args.envs,
                    reward_method="heuristic", auto_reset=True)
    env = ShardedGoEnv(cfg, make_mesh())
    sps = _timed_rollout(env, args.envs, args.steps, args.warmup, args.repeats)
    if jax.process_index() == 0:
        print(json.dumps({"processes": args.num_processes,
                          "env_steps_per_sec": round(sps)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["mesh", "procs"], default="mesh")
    ap.add_argument("--role", choices=["main", "worker"], default="main")
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    for k, v in DEFAULTS.items():
        ap.add_argument(f"--{k}", type=int, default=v)
    args = ap.parse_args()
    if args.role == "worker":
        run_worker(args)
    elif args.mode == "mesh":
        run_mesh_mode(args)
    else:
        run_procs_mode(args)


if __name__ == "__main__":
    main()
