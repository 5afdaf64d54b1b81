"""Grow a train.py checkpoint to a larger AZNet (Net2Net) and emit a new
train.py-compatible checkpoint that resumes FROM the parent's strength.

Params are widened/deepened function-preservingly
(gymgo_tpu.models.surgery.widen_deepen: group-aware channel duplication
under GroupNorm, zero-second-conv identity blocks for new depth, small
symmetry-breaking noise); the optimizer restarts fresh for the new
architecture; the replay buffer, env states, RNG and iteration counter
carry over unchanged — replay rows are board states + targets, which are
architecture-independent, so the grown net trains on the parent's data
from step one.

Usage:
  python scripts/net2net.py --in checkpoints/az19_seg5.npz \
      --out checkpoints/az19_big.npz --board 19 --envs 512 \
      --channels 64 --blocks 3 --new-channels 128 --new-blocks 6
  python train.py --resume checkpoints/az19_big.npz \
      --channels 128 --blocks 6 ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--board", type=int, required=True)
    ap.add_argument("--envs", type=int, required=True,
                    help="env count of the parent run (its env_states shape)")
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--new-channels", type=int, required=True)
    ap.add_argument("--new-blocks", type=int, required=True)
    ap.add_argument("--replay-capacity", type=int, default=1 << 16)
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="only shapes the fresh optimizer state template; "
                         "the actual lr comes from train.py's --lr at resume")
    ap.add_argument("--noise-scale", type=float, default=1e-2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")  # pure host-side surgery

    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.models import AZNetConfig, init_params
    from gymgo_tpu.models.surgery import widen_deepen
    from gymgo_tpu.rl import ReplayBuffer, make_train_state
    from gymgo_tpu.utils import checkpoint as ckpt

    old_cfg = AZNetConfig(board_size=args.board, channels=args.channels,
                          blocks=args.blocks)
    new_cfg = AZNetConfig(board_size=args.board, channels=args.new_channels,
                          blocks=args.new_blocks)
    key = jax.random.PRNGKey(args.seed)
    old_params = init_params(key, old_cfg)
    old_state, _ = make_train_state(old_params, learning_rate=args.lr)
    buf = ReplayBuffer(args.replay_capacity, args.board)
    tmpl = {
        "params": old_params,
        "opt_state": old_state.opt_state,
        "step": old_state.step,
        "buf": buf.init(),
        "env_states": batch_init_state(args.envs, args.board),
        "key": key,
        "iteration": jnp.asarray(0),
        "target_params": old_params,
    }
    data = ckpt.restore_npz(args.inp, tmpl)

    grown = widen_deepen(data["params"], old_cfg, new_cfg,
                         jax.random.fold_in(key, 1),
                         noise_scale=args.noise_scale)
    new_state, _ = make_train_state(grown, learning_rate=args.lr)
    out_tree = {
        "params": grown,
        "opt_state": new_state.opt_state,
        "step": data["step"],
        "buf": data["buf"],
        "env_states": data["env_states"],
        "key": data["key"],
        "iteration": data["iteration"],
        "target_params": grown,
    }
    ckpt.save_npz(args.out, out_tree)
    n_old = sum(x.size for x in jax.tree_util.tree_leaves(data["params"]))
    n_new = sum(x.size for x in jax.tree_util.tree_leaves(grown))
    print(f"grew {args.inp} ({args.channels}ch x {args.blocks}, "
          f"{n_old:,} params) -> {args.out} ({args.new_channels}ch x "
          f"{args.new_blocks}, {n_new:,} params) at iteration "
          f"{int(data['iteration'])}; replay/env states carried over")


if __name__ == "__main__":
    main()
