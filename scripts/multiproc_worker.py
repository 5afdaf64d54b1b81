"""Worker process for the simulated multi-host validation harness.

Each worker is one "host": it owns ``--local-devices`` virtual CPU devices,
joins the ``jax.distributed`` coordination service, builds the GLOBAL mesh
over all processes' devices, and runs a sharded rollout whose batch spans
hosts.  It prints one JSON line of replicated checksums; the launcher
(tests/test_multiprocess.py) asserts every process reports the same
values, bit-identical to a single-process run — the multi-host determinism contract of SURVEY §7.6
(per-env RNG folded by global index, sharding-invariant samplers).

Run directly:
  python scripts/multiproc_worker.py --coordinator localhost:9876 \
      --num-processes 2 --process-id 0 &
  python scripts/multiproc_worker.py --coordinator localhost:9876 \
      --num-processes 2 --process-id 1
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Invoked by path: Python puts scripts/ (not the repo root) on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--board", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    # Segmented checkpoint/restart mode (fault-injection harness,
    # SURVEY §5.3): the run is split into --num-segments rollouts of
    # steps/num_segments, each seeded fold_in(seed_key, segment) so a
    # restart can resume mid-run bit-exactly.  After each completed
    # segment the (replicated) global states are checkpointed.
    ap.add_argument("--num-segments", type=int, default=1)
    ap.add_argument("--start-segment", type=int, default=0)
    ap.add_argument("--ckpt", default=None,
                    help="npz checkpoint path (written after each segment "
                         "by process 0; read at --start-segment > 0)")
    ap.add_argument("--crash-after-segment", type=int, default=-1,
                    help="simulate a host failure: this process os._exit(1)s "
                         "right after the given segment's checkpoint lands")
    args = ap.parse_args()

    # Must be set before jax import; replaces (not appends) any inherited
    # value so the per-process device count is exactly as requested.
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}"
    )
    import jax

    # sitecustomize force-prepends the axon TPU platform; override after
    # import (the env var alone is not enough — see CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.parallel import ShardedGoEnv, make_mesh

    assert jax.process_count() == args.num_processes
    assert len(jax.devices()) == args.num_processes * args.local_devices

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    cfg = EnvConfig(
        board_size=args.board, batch_size=args.batch, auto_reset=True
    )
    mesh = make_mesh()
    env = ShardedGoEnv(cfg, mesh)

    if args.num_segments == 1:
        states = env.reset()
        r = env.rollout(jax.random.PRNGKey(args.seed), states, args.steps)
    else:
        # Segmented mode: resume support + optional simulated host failure.
        from gymgo_tpu.parallel import shard_states
        from gymgo_tpu.utils import checkpoint as ckpt

        assert args.steps % args.num_segments == 0
        seg_steps = args.steps // args.num_segments
        replicate = jax.jit(
            lambda x: x, out_shardings=NamedSharding(mesh, PartitionSpec())
        )
        if args.start_segment == 0:
            states = env.reset()
        else:
            tpl = {"states": np.zeros((args.batch, 6, args.board, args.board),
                                      np.int8)}
            states = shard_states(
                jnp.asarray(ckpt.restore_npz(args.ckpt, tpl)["states"]), mesh
            )
        seed_key = jax.random.PRNGKey(args.seed)
        for seg in range(args.start_segment, args.num_segments):
            r = env.rollout(jax.random.fold_in(seed_key, seg), states, seg_steps)
            states = r.final_states
            if args.ckpt:
                # replicated fetch is an all-gather: EVERY process must
                # participate; only process 0 writes the file.
                full = np.asarray(replicate(states))
                if jax.process_index() == 0:
                    ckpt.save_npz(args.ckpt, {"states": full})
            if seg == args.crash_after_segment:
                # simulated host failure: die WITHOUT distributed shutdown
                # (the launcher must detect the nonzero exit and restart
                # the job from the checkpoint)
                sys.stdout.flush()
                os._exit(1)

    # Checksums must be computed under jit: the outputs are global arrays
    # of which this process only addresses its local shards; the jitted
    # reductions return fully-replicated scalars.
    @jax.jit
    def summarize(final_states, actions, rewards):
        return (
            jnp.sum(final_states.astype(jnp.int32)),
            jnp.sum(actions.astype(jnp.int32)),
            jnp.sum(rewards.astype(jnp.float32)),
        )

    cs_state, cs_act, cs_rew = summarize(r.final_states, r.actions, r.rewards)
    print(
        json.dumps(
            {
                "process_id": args.process_id,
                "process_count": jax.process_count(),
                "global_devices": len(jax.devices()),
                "state_checksum": int(cs_state),
                "action_checksum": int(cs_act),
                "reward_checksum": float(cs_rew),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    sys.exit(main())
