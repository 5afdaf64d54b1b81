#!/bin/bash
# Round-5 flagship continuation: iters 830 -> 950 (one serialized TPU job).
#
# The gitignored checkpoints/ tree was wiped again by the inter-round
# driver restart (the round-4 failure mode, now routine), so the segment
# starts by re-seeding a resume tree from the committed iter-830 params
# artifact (scripts/params_to_ckpt.py — fresh optimizer/replay/envs,
# iteration counter 830; the 512x160 recipe refills the 64k replay with
# current-policy rows in one iteration).
#
# Recipe = the validated flagship recipe (BENCHMARKS.md round-4):
# --envs 512 (the measured search optimum; B=1024 hits the un-diagnosed
# search cliff), --lr 2e-4, --value-grounded-only (frozen-target
# bootstrap drifts to constant on long 19x19 runs), gumbel 32/m16.
# ~38s/iter incl. restart warmup -> 120 iters ~ 80 min.
set -ex
cd /root/repo

timeout 600 python scripts/params_to_ckpt.py \
    --params artifacts/az19_big128x6_iter830_params.npz \
    --out checkpoints/az19_big.npz --board 19 --envs 512 \
    --channels 128 --blocks 6 --iteration 830

timeout 9000 python train.py --board 19 --envs 512 --rollout-steps 160 \
    --iters 950 --channels 128 --blocks 6 --lr 2e-4 \
    --gumbel-sims 32 --gumbel-m 16 --augment --value-grounded-only \
    --checkpoint-every 10 \
    --checkpoint checkpoints/az19_big.npz \
    --resume checkpoints/az19_big.npz 2>&1 | tail -130
