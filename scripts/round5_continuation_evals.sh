#!/bin/bash
# Evals for the flagship continuation segment (iters 780->830, trained at
# the tail of round 4 from a params_to_ckpt-re-seeded tree after the
# checkpoints/ wipe).  Run when the chip is free; serialized TPU jobs only.
#
# The iter-830 artifact is ALREADY committed
# (artifacts/az19_big128x6_iter830_params.npz) — no export step here: a
# re-export from checkpoints/az19_big.npz would silently overwrite it
# with whatever iteration that tree holds at run time (advisor round-4
# finding).  set -e so a crashed eval stops the chain instead of
# stacking another job on a wedged tunnel.
set -ex
cd /root/repo

# done-criterion: the continuation holds or beats its iter-780 parent
# (equal search, mirrored random openings).  A 50-iter segment on a
# 780-iter line is a small dose — expect a modest edge, not a rout.
# --retries 2: supervised per-chunk ledger; a TPU kernel fault costs one
# chunk, not the eval (the round-4 failure mode).
timeout 7200 python scripts/eval_ckpt.py \
    --ckpt artifacts/az19_big128x6_iter830_params.npz --channels 128 --blocks 6 \
    --opp-ckpt artifacts/az19_big128x6_params.npz --opp-channels 128 --opp-blocks 6 \
    --board 19 --sims 32 --gumbel-m 16 --games 128 --opening-moves 6 \
    --chunk 64 --retries 2 2>&1 | tail -8

timeout 5400 python scripts/eval_ckpt.py \
    --ckpt artifacts/az19_big128x6_iter830_params.npz --channels 128 --blocks 6 \
    --board 19 --sims 32 --gumbel-m 16 --games 128 \
    --chunk 64 --retries 2 2>&1 | tail -6
