#!/bin/bash
# Round-5 9x9 artifact refresh (verdict #7): one run with the modern
# recipe (grounded-only values, gumbel-m 16, opening-diverse eval)
# replacing the round-2-era az9_iter80 (which predates every training
# lesson since).  Serialized TPU jobs.
set -ex
cd /root/repo

timeout 5400 python train.py --board 9 --envs 256 --rollout-steps 96 \
    --iters 100 --gumbel-sims 32 --gumbel-m 16 --augment \
    --value-grounded-only --checkpoint-every 10 \
    --checkpoint checkpoints/az9_r5.npz 2>&1 | tail -20

timeout 600 python scripts/export_params.py \
    --ckpt checkpoints/az9_r5.npz \
    --out artifacts/az9_r5_iter100_params.npz --board 9

# strength: vs random (full search) and vs the old round-2 artifact,
# both under mirrored random openings + the supervised retry harness
timeout 3600 python scripts/eval_ckpt.py \
    --ckpt artifacts/az9_r5_iter100_params.npz \
    --board 9 --sims 32 --gumbel-m 16 --games 128 --chunk 64 \
    --retries 2 2>&1 | tail -6

timeout 3600 python scripts/eval_ckpt.py \
    --ckpt artifacts/az9_r5_iter100_params.npz \
    --opp-ckpt artifacts/az9_iter80_params.npz \
    --board 9 --sims 32 --gumbel-m 16 --games 128 --opening-moves 4 \
    --chunk 64 --retries 2 2>&1 | tail -6

# value-head health, in-distribution + OOD
timeout 1200 python scripts/value_probe.py --ckpt checkpoints/az9_r5.npz \
    --replay-from checkpoints/az9_r5.npz --board 9 2>&1 | tail -3
timeout 1200 python scripts/value_probe.py --ckpt checkpoints/az9_r5.npz \
    --board 9 2>&1 | tail -3
