#!/bin/bash
# Round-5 stretch (round-4 verdict #6): second Net2Net capacity step.
#
# Width growth must be an integer factor (models/surgery.py:144 —
# group-aware duplication), so 128ch can only double to 256ch (~4x conv
# FLOPs, ~150s/iter at --envs 512: over the verdict's ~60s/iter bar).
# The affordable second step is DEPTH-only: 128ch x 6 -> 128ch x 9
# (~1.5x FLOPs) — new blocks enter as zero-gamma identity blocks (the
# measured-safe recipe from round 4), so the grown net is
# function-identical to its parent at step 0 (verified on real boards:
# argmax agreement 1.000, max |dv| 0.0000 in this round's CPU dry run).
#
# Growth starts from the PROVEN iter-830 parent, NOT the regressed
# iter-950 tree (same-arch continuation went backwards, BENCHMARKS.md
# round-5 negative result).  This segment is also the direct test of
# that postmortem's hypothesis: added capacity should restore the
# self-play improvement signal that same-arch training at 32 sims lost.
#
# Chain: re-seed tree from iter-830 artifact -> grow to 128x9 -> train a
# segment at the validated recipe -> export + h2h vs the iter-830 parent
# + vs random, under the fault-tolerant supervisor.
set -ex
cd /root/repo

ITERS=${1:-890}   # train to this iteration (default: a 60-iter segment)

timeout 600 python scripts/params_to_ckpt.py \
    --params artifacts/az19_big128x6_iter830_params.npz \
    --out checkpoints/az19_big830.npz --board 19 --envs 512 \
    --channels 128 --blocks 6 --iteration 830

timeout 1200 python scripts/net2net.py --in checkpoints/az19_big830.npz \
    --out checkpoints/az19_deep.npz --board 19 --envs 512 \
    --channels 128 --blocks 6 --new-channels 128 --new-blocks 9

timeout 7200 python train.py --board 19 --envs 512 --rollout-steps 160 \
    --iters "$ITERS" --channels 128 --blocks 9 --lr 2e-4 \
    --gumbel-sims 32 --gumbel-m 16 --augment --value-grounded-only \
    --checkpoint-every 10 \
    --checkpoint checkpoints/az19_deep.npz \
    --resume checkpoints/az19_deep.npz 2>&1 | tail -70

IT=$(python -c "import numpy as np; print(int(np.load('checkpoints/az19_deep.npz')['iteration::0']))")
ART=artifacts/az19_deep128x9_iter${IT}_params.npz

timeout 600 python scripts/export_params.py \
    --ckpt checkpoints/az19_deep.npz \
    --out "$ART" --board 19 --channels 128 --blocks 9

timeout 7200 python scripts/eval_ckpt.py \
    --ckpt "$ART" --channels 128 --blocks 9 \
    --opp-ckpt artifacts/az19_big128x6_iter830_params.npz --opp-channels 128 --opp-blocks 6 \
    --board 19 --sims 32 --gumbel-m 16 --games 128 --opening-moves 6 \
    --chunk 64 --retries 2 2>&1 | tail -8

timeout 5400 python scripts/eval_ckpt.py \
    --ckpt "$ART" --channels 128 --blocks 9 \
    --board 19 --sims 32 --gumbel-m 16 --games 128 \
    --chunk 64 --retries 2 2>&1 | tail -6
