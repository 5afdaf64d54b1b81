"""Multi-host scaling benchmark (BASELINE configs[3]): envs sharded across a
TPU pod slice, per-host throughput and scaling efficiency.

Run the SAME command on every host of the slice (or under your cluster
launcher); on single-host it degrades gracefully to a local all-device
mesh.  Host-scaling is expected near-linear: the step has no collective on
the critical path (envs are embarrassingly parallel), so efficiency loss
can only come from compilation skew and the final metric psum.

  python scripts/multihost_bench.py --coordinator <host0>:8476 \
      --num-processes 4 --process-id $ID --board 19 --envs-per-host 8192
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="", help="host:port of process 0")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--board", type=int, default=19)
    ap.add_argument("--envs-per-host", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--warmup-steps", type=int, default=768)
    args = ap.parse_args()

    import jax

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax.numpy as jnp

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.env.batch_env import rollout
    from gymgo_tpu.parallel import env_sharding, make_mesh

    n_proc = jax.process_count()
    mesh = make_mesh()
    global_envs = args.envs_per_host * n_proc
    cfg = EnvConfig(
        board_size=args.board,
        batch_size=global_envs,
        reward_method="heuristic",
        auto_reset=True,
    )
    sharding = env_sharding(mesh, 4)

    # Each host materializes only its shard (jax.make_array_from_callback).
    global_shape = (global_envs, 6, args.board, args.board)
    states = jax.make_array_from_callback(
        global_shape,
        sharding,
        lambda idx: batch_init_state(
            len(range(*idx[0].indices(global_envs))), args.board
        ),
    )

    import functools

    @functools.partial(jax.jit, static_argnames=("steps",))
    def roll(key, states, steps):
        r = rollout(key, states, steps, cfg)
        return r.final_states, jnp.sum(r.final_states.astype(jnp.int32))

    key = jax.random.PRNGKey(0)
    states, c = roll(key, states, args.warmup_steps)
    float(c)
    t0 = time.perf_counter()
    states, c = roll(jax.random.fold_in(key, 1), states, args.steps)
    float(c)
    dt = time.perf_counter() - t0
    total_steps = global_envs * args.steps
    if jax.process_index() == 0:
        chips = len(jax.devices())
        print(
            f"hosts={n_proc} chips={chips} envs={global_envs} "
            f"steps/s={total_steps / dt:,.0f} "
            f"steps/s/chip={total_steps / dt / chips:,.0f}"
        )


if __name__ == "__main__":
    main()
