"""Rebuild a full train.py resume tree from a params-only artifact.

Full checkpoints (optimizer + replay + env states) are gitignored and do
NOT survive workspace cleanups; the committed ``artifacts/*_params.npz``
files do.  This tool re-seeds a train.py-compatible checkpoint from one:
params (and frozen-target params) come from the artifact, the optimizer
restarts fresh, the replay buffer starts empty, env states are fresh
boards, and the iteration counter is set to ``--iteration`` so a resumed
run continues numbering where the artifact's line left off.

With the standard 19x19 recipe (--envs 512 --rollout-steps 160) one
iteration generates 81,920 rows — more than the default 65,536-row
replay capacity — so the buffer refills with current-policy data in a
single iteration and the fresh-optimizer warmup is brief (lr is low at
continuation time; the parent line used 2e-4).

Usage:
  python scripts/params_to_ckpt.py \
      --params artifacts/az19_big128x6_params.npz \
      --out checkpoints/az19_big.npz --board 19 --envs 512 \
      --channels 128 --blocks 6 --iteration 780 --lr 2e-4
  python train.py --resume checkpoints/az19_big.npz --iters 900 ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", required=True,
                    help="params-only artifact (scripts/export_params.py)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--board", type=int, required=True)
    ap.add_argument("--envs", type=int, required=True)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--iteration", type=int, required=True,
                    help="iteration counter for the resumed line")
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="only shapes the saved optimizer tree's "
                         "structure; the EFFECTIVE lr comes from the "
                         "resuming train.py's own --lr (adamw opt_state "
                         "stores no learning rate)")
    ap.add_argument("--replay-capacity", type=int, default=1 << 16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.models import AZNetConfig, init_params
    from gymgo_tpu.rl import ReplayBuffer, make_train_state
    from gymgo_tpu.utils import checkpoint as ckpt

    net_cfg = AZNetConfig(board_size=args.board, channels=args.channels,
                          blocks=args.blocks)
    tmpl = {"params": init_params(jax.random.PRNGKey(0), net_cfg)}
    params = ckpt.restore_npz(args.params, tmpl)["params"]

    train_state, _tx = make_train_state(params, learning_rate=args.lr)
    buf = ReplayBuffer(args.replay_capacity, args.board)
    tree = {
        "params": train_state.params,
        "opt_state": train_state.opt_state,
        "step": train_state.step,
        "buf": buf.init(),
        "env_states": batch_init_state(args.envs, args.board),
        "key": jax.random.PRNGKey(args.seed),
        "iteration": jnp.asarray(args.iteration),
        "target_params": params,
    }
    ckpt.save_npz(args.out, tree)
    print(f"{args.out}: {os.path.getsize(args.out) / 1e6:.1f} MB "
          f"(iteration {args.iteration}, fresh optimizer/replay/envs)")


if __name__ == "__main__":
    main()
