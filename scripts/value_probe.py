"""Value-head collapse probe: is a checkpoint's value head non-constant
and does it track real outcomes?

Under truncation bootstrap, TOTAL v-loss stops being a collapse signal:
most rows' targets are the frozen target net's own predictions, which the
online net matches almost for free, so v-loss ~0.01 is expected from a
HEALTHY run (round-3 finding; contrast round 2 where bootstrap-from-online
collapse showed the same low v-loss but degrading pi-loss and winrate).
This probe measures what matters directly: play random games to their
ends, evaluate the value head on the final and near-final boards, and
report (a) the std of predictions (collapse => ~0) and (b) the sign
agreement between prediction and the true Trump-Taylor winner.

Usage: python scripts/value_probe.py --ckpt checkpoints/az13_seg2.npz \
          --board 13 [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--board", type=int, default=13)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--games", type=int, default=256)
    ap.add_argument("--komi", type=float, default=0.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core import score as _score
    from gymgo_tpu.core import state as _state
    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.env.batch_env import rollout
    from gymgo_tpu.models import AZNet, AZNetConfig, init_params
    from gymgo_tpu.rl.selfplay import net_value_black
    from gymgo_tpu.utils import checkpoint as ckpt

    n = args.board
    netcfg = AZNetConfig(board_size=n, channels=args.channels,
                         blocks=args.blocks)
    net = AZNet(netcfg)
    tmpl = {"params": init_params(jax.random.PRNGKey(0), netcfg)}
    params = ckpt.restore_npz(args.ckpt, tmpl)["params"]

    # Random games frozen at their ends (no auto-reset): final boards carry
    # ground-truth outcomes; 85%-length replays give near-final boards.
    cfg = EnvConfig(board_size=n, batch_size=args.games, komi=args.komi,
                    auto_reset=False)
    steps_full = 3 * n * n

    @jax.jit
    def probe(key, num_steps):
        sts = rollout(key, batch_init_state(args.games, n),
                      steps_full, cfg).final_states
        done = _state.game_ended(sts)
        truth = _score.winning(sts, args.komi)
        v = net_value_black(sts, params, net.apply)
        return sts, done, truth, v

    _, done, truth, v = probe(jax.random.PRNGKey(7), steps_full)
    done, truth, v = map(np.asarray, (done, truth, v))
    sel = done & (truth != 0)
    agree = np.mean(np.sign(v[sel]) == truth[sel]) if sel.any() else float("nan")
    print(f"terminal boards: n={int(sel.sum())}  value std={v.std():.4f}  "
          f"mean|v|={np.abs(v).mean():.4f}  sign-agreement with true "
          f"winner={agree:.3f}")
    if v.std() < 1e-3:
        print("VERDICT: COLLAPSED (constant value head)")
    elif agree > 0.75:
        print("VERDICT: healthy (non-constant, tracks outcomes)")
    else:
        print("VERDICT: non-constant but weakly grounded — inspect further")


if __name__ == "__main__":
    main()
