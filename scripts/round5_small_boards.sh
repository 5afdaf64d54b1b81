#!/bin/bash
# Round-5 small-board refresh with the validated recipe (serialized TPU
# jobs).  Two goals from the round-4 verdict:
#   #3: a 13x13 line that actually improves with training.  The old
#       line's iter-50 peak checkpoint was LOST in the round-4
#       checkpoints/ wipe (only iter-100/200 artifacts survive), and the
#       line itself was trained with the since-falsified bootstrap
#       recipe — so rather than continue a known-regressed line, train a
#       FRESH line with the modern recipe (grounded-only value targets,
#       live zero-init-free head from scratch, gumbel-m 16) and require
#       its own ladder (under mirrored openings) to be monotone.
#   #7: refresh the stale round-2-era 9x9 artifact the same way.
set -ex
cd /root/repo

# ---- 13x13 fresh line: 150 iters, snapshots at 50/100/150
timeout 7200 python train.py --board 13 --envs 256 --rollout-steps 112 \
    --iters 150 --gumbel-sims 32 --gumbel-m 16 --augment \
    --value-grounded-only --snapshot-every 50 --checkpoint-every 10 \
    --checkpoint checkpoints/az13_r5.npz 2>&1 | tail -30

for it in 50 100 150; do
  timeout 600 python scripts/export_params.py \
      --ckpt checkpoints/az13_r5_iter${it}.npz \
      --out artifacts/az13_r5_iter${it}_params.npz --board 13
done

# ---- the new line's ladder + the surviving old artifacts, openings on
timeout 7200 python scripts/elo_ladder.py --boardsize 13 --batched \
    --games 64 --chunk 64 --opening-moves 6 --gumbel-m 16 --retries 2 \
    --player random \
    --player old100=net:artifacts/az13_iter100_params.npz:32 \
    --player old200=net:artifacts/az13_iter200_params.npz:32 \
    --player new50=net:artifacts/az13_r5_iter50_params.npz:32 \
    --player new100=net:artifacts/az13_r5_iter100_params.npz:32 \
    --player new150=net:artifacts/az13_r5_iter150_params.npz:32 \
    2>&1 | tail -30

# value-head health for the new line, in-distribution + OOD
timeout 1200 python scripts/value_probe.py --ckpt checkpoints/az13_r5.npz \
    --replay-from checkpoints/az13_r5.npz --board 13 2>&1 | tail -3
timeout 1200 python scripts/value_probe.py --ckpt checkpoints/az13_r5.npz \
    --board 13 2>&1 | tail -3
