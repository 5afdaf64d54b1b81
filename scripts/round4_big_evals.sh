#!/bin/bash
# Post-Job-B evals: the grown flagship vs its 64ch parent + vs random.
set -x
cd /root/repo

timeout 600 python scripts/export_params.py \
    --ckpt checkpoints/az19_big.npz \
    --out artifacts/az19_big128x6_params.npz --board 19 \
    --channels 128 --blocks 6

# done-criterion: beats the best 64ch artifact head-to-head >= 0.55
timeout 5400 python scripts/eval_ckpt.py \
    --ckpt artifacts/az19_big128x6_params.npz --channels 128 --blocks 6 \
    --opp-ckpt artifacts/az19_iter600_params.npz --opp-channels 64 --opp-blocks 3 \
    --board 19 --sims 32 --gumbel-m 16 --games 128 --opening-moves 6 \
    2>&1 | tail -4

timeout 3600 python scripts/eval_ckpt.py \
    --ckpt artifacts/az19_big128x6_params.npz --channels 128 --blocks 6 \
    --board 19 --sims 32 --gumbel-m 16 --games 128 2>&1 | tail -3
