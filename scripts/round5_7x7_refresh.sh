#!/bin/bash
# Round-5: give 7x7 a COMMITTED params artifact (the round-2/3 7x7
# checkpoints were gitignored resume trees and did not survive driver
# restarts — every other board size already has artifacts/*.npz).
# Modern recipe, ~2s/iter: the whole chain is a ~10-min TPU job.
set -ex
cd /root/repo

timeout 3600 python train.py --board 7 --envs 256 --rollout-steps 64 \
    --iters 120 --gumbel-sims 32 --gumbel-m 16 --augment \
    --value-grounded-only --checkpoint-every 10 \
    --checkpoint checkpoints/az7_r5.npz 2>&1 | tail -10

timeout 600 python scripts/export_params.py \
    --ckpt checkpoints/az7_r5.npz \
    --out artifacts/az7_r5_iter120_params.npz --board 7

timeout 3600 python scripts/eval_ckpt.py \
    --ckpt artifacts/az7_r5_iter120_params.npz \
    --board 7 --sims 32 --gumbel-m 16 --games 256 --chunk 128 \
    --retries 2 2>&1 | tail -4

timeout 1200 python scripts/value_probe.py --ckpt checkpoints/az7_r5.npz \
    --replay-from checkpoints/az7_r5.npz --board 7 2>&1 | tail -2
