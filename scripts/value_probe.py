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

In-distribution mode (--replay-from TREE.npz): instead of random-game
terminal boards (out-of-distribution for a trained net), probe the value
head on GROUNDED rows of a train.py resume tree's replay buffer — real
self-play positions whose stored value target is an actual +-1 game
outcome (vmask on), in exactly the learner's frame (canonical obs,
mover-perspective value).  This is the probe the round-4 verdict asked
for: "the head is healthy" should rest on in-distribution positions,
not only random boards.  --ckpt may be the same tree or any params
artifact of the same architecture (e.g. probe an older net on the
current line's replay).
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
    ap.add_argument("--replay-from", default="",
                    help="train.py checkpoint tree: probe on its replay "
                         "buffer's grounded rows (in-distribution) "
                         "instead of random-game terminal boards")
    ap.add_argument("--max-rows", type=int, default=8192,
                    help="--replay-from: cap on probed grounded rows")
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

    if args.replay_from:
        _replay_probe(args, net, params)
        return

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


def _replay_probe(args, net, params):
    """Probe on grounded replay rows, in the learner's exact frame."""
    import jax
    import numpy as np

    from gymgo_tpu.rl import ReplayBuffer
    from gymgo_tpu.utils import checkpoint as ckpt

    raw = np.load(args.replay_from)
    # ReplayState leaf order: obs, policy, value, mask, vmask, cursor, filled
    capacity = raw["buf::0"].shape[0]
    buf_tmpl = ReplayBuffer(capacity, args.board).init()
    buf = ckpt.restore_npz(args.replay_from, {"buf": buf_tmpl})["buf"]

    obs = np.asarray(buf.obs)
    target = np.asarray(buf.value)
    filled = int(buf.filled)
    live = np.zeros(capacity, bool)
    live[:filled] = True
    grounded = live & np.asarray(buf.mask) & np.asarray(buf.vmask)
    idx = np.flatnonzero(grounded)
    if idx.size == 0:
        print("no grounded rows in the replay window (fresh re-seeded "
              "tree?) — nothing to probe")
        return
    if idx.size > args.max_rows:
        idx = np.random.default_rng(0).choice(idx, args.max_rows,
                                              replace=False)
    fwd = jax.jit(lambda p, o: net.apply(p, o)[1])
    preds = []
    for s in range(0, idx.size, 1024):
        chunk = obs[idx[s:s + 1024]]
        preds.append(np.asarray(fwd(params, chunk)))
    v = np.concatenate(preds)
    t = target[idx[:v.size]]
    dec = t != 0  # grounded targets are +-1; 0 = tie (rare)
    agree = (np.mean(np.sign(v[dec]) == np.sign(t[dec]))
             if dec.any() else float("nan"))
    print(f"replay grounded rows: n={idx.size} of {filled} filled  "
          f"value std={v.std():.4f}  mean|v|={np.abs(v).mean():.4f}  "
          f"sign-agreement with stored outcome={agree:.3f}")
    if v.std() < 1e-3:
        print("VERDICT: COLLAPSED (constant value head)")
    elif agree > 0.75:
        print("VERDICT: healthy in-distribution (tracks self-play outcomes)")
    else:
        print("VERDICT: non-constant but weakly grounded in-distribution")


if __name__ == "__main__":
    main()
