"""Quantify the batch-max selection-walk depth vs batch size.

The Gumbel/PUCT selection walk (rl/treewalk.walk_paths) is a
``lax.while_loop`` whose trip count is the BATCH-MAX path depth of that
simulation — the same batch-max coupling that closed the flood trip-count
direction (BENCHMARKS.md warm-start postmortem): per-env depth
distributions are fixed, but max over B grows ~log B, so per-env walk cost
rises with batch even though every other stage is linear.  This script
measures that distribution directly — per-sim mean / p99 / batch-max walk
depth at several batch sizes on identical mid-game boards — by wrapping
``walk_paths`` and streaming ``depth_b`` out via ``io_callback``.  The
numbers are backend-independent (depths are a property of the search, not
the device), so CPU runs inform the TPU sweep table.

Usage: python scripts/walk_depth_study.py --board 13 --sims 32 \
          --batches 64,256,1024
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--board", type=int, default=13)
    ap.add_argument("--sims", type=int, default=32)
    ap.add_argument("--gumbel-m", type=int, default=16)
    ap.add_argument("--channels", type=int, default=8)
    ap.add_argument("--blocks", type=int, default=1)
    ap.add_argument("--batches", default="64,256,1024")
    ap.add_argument("--searches", type=int, default=4,
                    help="independent searches per batch size")
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.env.batch_env import rollout
    from gymgo_tpu.models import AZNet, AZNetConfig, init_params
    from gymgo_tpu.rl import treewalk
    from gymgo_tpu.rl.gumbel_mcts import run_gumbel_mcts

    n = args.board
    netcfg = AZNetConfig(board_size=n, channels=args.channels,
                         blocks=args.blocks)
    net = AZNet(netcfg)
    params = init_params(jax.random.PRNGKey(0), netcfg)

    depths_log = []
    orig_walk = treewalk.walk_paths

    def recording_walk(*a, **kw):
        depth_b, path_n, path_a = orig_walk(*a, **kw)
        jax.experimental.io_callback(
            lambda d: depths_log.append(np.asarray(d)), None, depth_b,
            ordered=True,
        )
        return depth_b, path_n, path_a

    import jax.experimental  # noqa: F401  (io_callback)

    max_b = max(int(x) for x in args.batches.split(","))
    cfg_warm = EnvConfig(board_size=n, batch_size=max_b, auto_reset=True)
    warm = jax.jit(lambda k, s: rollout(k, s, 96, cfg_warm).final_states)
    boards = warm(jax.random.PRNGKey(1), batch_init_state(max_b, n))
    boards.block_until_ready()

    print(f"| B | per-env mean depth | p99 | mean batch-max | walk-trip "
          f"ratio vs B={args.batches.split(',')[0]} |")
    print("|---|---|---|---|---|")
    base_max = None
    treewalk.walk_paths = recording_walk
    try:
        for bs in (int(x) for x in args.batches.split(",")):
            depths_log.clear()
            run = jax.jit(lambda k, s: run_gumbel_mcts(
                k, s, params, net.apply, num_simulations=args.sims,
                max_considered=args.gumbel_m).actions)
            for i in range(args.searches):
                run(jax.random.fold_in(jax.random.PRNGKey(2), i),
                    boards[:bs]).block_until_ready()
            d = np.concatenate([x.ravel() for x in depths_log])
            per_sim_max = np.array([x.max() for x in depths_log])
            mean_max = per_sim_max.mean()
            if base_max is None:
                base_max = mean_max
            print(f"| {bs} | {d.mean():.2f} | {np.percentile(d, 99):.0f} | "
                  f"{mean_max:.2f} | {mean_max / base_max:.2f}x |",
                  flush=True)
    finally:
        treewalk.walk_paths = orig_walk


if __name__ == "__main__":
    main()
