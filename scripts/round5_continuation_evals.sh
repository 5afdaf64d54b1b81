#!/bin/bash
# Evals for the flagship continuation segment (iters 780->830, trained at
# the tail of round 4 from a params_to_ckpt-re-seeded tree after the
# checkpoints/ wipe).  Run when the chip is free; serialized TPU jobs only.
set -x
cd /root/repo

# If checkpoints/ was wiped again, re-seed from the committed artifact
# first:
#   python scripts/params_to_ckpt.py \
#       --params artifacts/az19_big128x6_iter830_params.npz \
#       --out checkpoints/az19_big.npz --board 19 --envs 512 \
#       --channels 128 --blocks 6 --iteration 830 --lr 2e-4

timeout 600 python scripts/export_params.py \
    --ckpt checkpoints/az19_big.npz \
    --out artifacts/az19_big128x6_iter830_params.npz --board 19 \
    --channels 128 --blocks 6

# done-criterion: the continuation holds or beats its iter-780 parent
# (equal search, mirrored random openings).  A 50-iter segment on a
# 780-iter line is a small dose — expect a modest edge, not a rout.
timeout 5400 python scripts/eval_ckpt.py \
    --ckpt artifacts/az19_big128x6_iter830_params.npz --channels 128 --blocks 6 \
    --opp-ckpt artifacts/az19_big128x6_params.npz --opp-channels 128 --opp-blocks 6 \
    --board 19 --sims 32 --gumbel-m 16 --games 128 --opening-moves 6 \
    2>&1 | tail -4

timeout 3600 python scripts/eval_ckpt.py \
    --ckpt artifacts/az19_big128x6_iter830_params.npz --channels 128 --blocks 6 \
    --board 19 --sims 32 --gumbel-m 16 --games 128 2>&1 | tail -3
