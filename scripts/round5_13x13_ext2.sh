#!/bin/bash
# Round-5: 13x13 300->600.  Either the line stays monotone (stronger
# published net) or we locate the 13x13 same-arch ceiling — the 19x19
# postmortem predicts a plateau exists at every board size, just much
# later at 13x13 than at 19x19 for 32-sim search.
set -ex
cd /root/repo

timeout 3600 python train.py --board 13 --envs 256 --rollout-steps 112 \
    --iters 600 --gumbel-sims 32 --gumbel-m 16 --augment \
    --value-grounded-only --snapshot-every 100 --checkpoint-every 10 \
    --checkpoint checkpoints/az13_r5.npz \
    --resume checkpoints/az13_r5.npz 2>&1 | tail -10

for it in 400 500 600; do
  timeout 600 python scripts/export_params.py \
      --ckpt checkpoints/az13_r5_iter${it}.npz \
      --out artifacts/az13_r5_iter${it}_params.npz --board 13
done

timeout 7200 python scripts/elo_ladder.py --boardsize 13 --batched \
    --games 64 --chunk 64 --opening-moves 6 --gumbel-m 16 --retries 2 \
    --player new300=net:artifacts/az13_r5_iter300_params.npz:32 \
    --player new400=net:artifacts/az13_r5_iter400_params.npz:32 \
    --player new500=net:artifacts/az13_r5_iter500_params.npz:32 \
    --player new600=net:artifacts/az13_r5_iter600_params.npz:32 \
    2>&1 | tail -20
