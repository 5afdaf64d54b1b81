"""Export a params-only artifact from a full train.py checkpoint.

Full checkpoints carry the whole resume tree (replay buffer, optimizer,
env states — ~120MB at 13x13) and stay gitignored; the params alone are
~6MB and are what eval_ckpt / demo.py / GTP need to PLAY.  Artifacts
written here load with the exact same ``restore_npz({"params": ...})``
template the tools already use.

Usage: python scripts/export_params.py --ckpt checkpoints/az19_gumbel.npz \
          --out artifacts/az19_iter200_params.npz --board 19
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--board", type=int, required=True)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gymgo_tpu.models import AZNetConfig, init_params
    from gymgo_tpu.utils import checkpoint as ckpt

    netcfg = AZNetConfig(board_size=args.board, channels=args.channels,
                         blocks=args.blocks)
    tmpl = {"params": init_params(jax.random.PRNGKey(0), netcfg)}
    params = ckpt.restore_npz(args.ckpt, tmpl)["params"]
    ckpt.save_npz(args.out, {"params": params})
    print(f"{args.out}: {os.path.getsize(args.out) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
