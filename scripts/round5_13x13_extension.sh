#!/bin/bash
# Round-5 bonus: extend the fresh 13x13 line 150->300 iters (13x13 trains
# at ~4s/iter, so this is a ~12-min TPU job) and ladder the new snapshots
# against the proven monotone prefix.  Tests whether small-board
# continuation keeps improving where the mature 19x19 line regressed —
# the same-arch-ceiling postmortem predicts small boards have more
# headroom before 32-sim search stops being an improvement operator.
set -ex
cd /root/repo

timeout 3600 python train.py --board 13 --envs 256 --rollout-steps 112 \
    --iters 300 --gumbel-sims 32 --gumbel-m 16 --augment \
    --value-grounded-only --snapshot-every 50 --checkpoint-every 10 \
    --checkpoint checkpoints/az13_r5.npz \
    --resume checkpoints/az13_r5.npz 2>&1 | tail -20

for it in 200 250 300; do
  timeout 600 python scripts/export_params.py \
      --ckpt checkpoints/az13_r5_iter${it}.npz \
      --out artifacts/az13_r5_iter${it}_params.npz --board 13
done

timeout 7200 python scripts/elo_ladder.py --boardsize 13 --batched \
    --games 64 --chunk 64 --opening-moves 6 --gumbel-m 16 --retries 2 \
    --player random \
    --player new100=net:artifacts/az13_r5_iter100_params.npz:32 \
    --player new150=net:artifacts/az13_r5_iter150_params.npz:32 \
    --player new200=net:artifacts/az13_r5_iter200_params.npz:32 \
    --player new300=net:artifacts/az13_r5_iter300_params.npz:32 \
    2>&1 | tail -25
