#!/bin/bash
# Round-5 flagship proof chain, serialized TPU jobs (run when the chip is
# free, after the 830->950 continuation segment — or after cutting that
# segment early on a bad-tunnel day; the chain evals whatever iteration
# the resume tree actually holds):
#   1. export iter-N params artifact (N read from the tree; refuses N<=830)
#   2. iter-N vs iter-830 h2h       — the new ladder rung
#   3. iter-N vs uniform-random     — absolute yardstick
#   4. in-distribution value probe  — replay is full of current-policy rows
# (The pending iter-830 vs iter-780 h2h ran separately first via
# scripts/round5_continuation_evals.sh: 0.583, BENCHMARKS.md.)
# All evals run under the fault-tolerant supervisor (--retries 2,
# --chunk 64): a TPU kernel fault costs one chunk, not the eval.
set -ex
cd /root/repo

IT=$(python - <<'EOF'
import numpy as np
z = np.load("checkpoints/az19_big.npz")
it = int(z["iteration::0"])
assert it > 830, f"resume tree at iteration {it} - no continuation to eval"
print(it)
EOF
)
ART=artifacts/az19_big128x6_iter${IT}_params.npz

timeout 600 python scripts/export_params.py \
    --ckpt checkpoints/az19_big.npz \
    --out "$ART" --board 19 \
    --channels 128 --blocks 6

timeout 7200 python scripts/eval_ckpt.py \
    --ckpt "$ART" --channels 128 --blocks 6 \
    --opp-ckpt artifacts/az19_big128x6_iter830_params.npz --opp-channels 128 --opp-blocks 6 \
    --board 19 --sims 32 --gumbel-m 16 --games 128 --opening-moves 6 \
    --chunk 64 --retries 2 2>&1 | tail -8

timeout 5400 python scripts/eval_ckpt.py \
    --ckpt "$ART" --channels 128 --blocks 6 \
    --board 19 --sims 32 --gumbel-m 16 --games 128 \
    --chunk 64 --retries 2 2>&1 | tail -6

# in-distribution value-head health: the just-finished tree's replay is
# full of current-policy grounded rows
timeout 1800 python scripts/value_probe.py \
    --ckpt checkpoints/az19_big.npz --channels 128 --blocks 6 --board 19 \
    --replay-from checkpoints/az19_big.npz 2>&1 | tail -3
