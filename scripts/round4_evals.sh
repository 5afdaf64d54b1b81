#!/bin/bash
# Round-4 post-seg5 evaluation sequence (run AFTER train.py seg-5 exits and
# the tunnel is confirmed healthy).  Serialized TPU jobs under timeouts per
# CLAUDE.md ops rules; CPU probe first.
set -x
cd /root/repo

# 1. params-only artifact
timeout 600 python scripts/export_params.py \
    --ckpt checkpoints/az19_seg5.npz \
    --out artifacts/az19_iter600_params.npz --board 19

# 2. value-head health probe (CPU — no tunnel dependency)
timeout 1800 python scripts/value_probe.py \
    --ckpt checkpoints/az19_seg5.npz --board 19 --games 128 --cpu \
    2>&1 | tail -3

# 3. head-to-head vs the collapsed-head iter-300 flagship, 256 games via
#    chunking (also demonstrates the --games 256 kernel-fault workaround),
#    with opening diversity
timeout 5400 python scripts/eval_ckpt.py \
    --ckpt artifacts/az19_iter600_params.npz \
    --opp-ckpt artifacts/az19_iter300_params.npz \
    --board 19 --sims 32 --gumbel-m 16 --games 256 --chunk 128 \
    --opening-moves 6 2>&1 | tail -5

# 4. head-to-head vs iter-420 (the direct predecessor)
timeout 5400 python scripts/eval_ckpt.py \
    --ckpt artifacts/az19_iter600_params.npz \
    --opp-ckpt artifacts/az19_iter420_params.npz \
    --board 19 --sims 32 --gumbel-m 16 --games 128 \
    --opening-moves 6 2>&1 | tail -4

# 5. full-search eval vs uniform-random
timeout 3600 python scripts/eval_ckpt.py \
    --ckpt artifacts/az19_iter600_params.npz \
    --board 19 --sims 32 --gumbel-m 16 --games 128 2>&1 | tail -3
