#!/bin/bash
# Round-5 flagship proof chain, serialized TPU jobs (run when the chip is
# free, after the 830->950 training segment lands):
#   1. export iter-950 params artifact (guarded by iteration check)
#   2. iter-950 vs iter-830 h2h     — the new ladder rung
#   3. iter-950 vs uniform-random   — absolute yardstick
# (The pending iter-830 vs iter-780 h2h runs separately first, via
# scripts/round5_continuation_evals.sh — not duplicated here.)
# All evals run under the fault-tolerant supervisor (--retries 2,
# --chunk 64): a TPU kernel fault costs one chunk, not the eval.
set -ex
cd /root/repo

python - <<'EOF'
import numpy as np
z = np.load("checkpoints/az19_big.npz")
it = int(z["iteration::0"])
assert it == 950, f"resume tree at iteration {it}, expected 950 - refusing to export"
EOF

timeout 600 python scripts/export_params.py \
    --ckpt checkpoints/az19_big.npz \
    --out artifacts/az19_big128x6_iter950_params.npz --board 19 \
    --channels 128 --blocks 6

timeout 7200 python scripts/eval_ckpt.py \
    --ckpt artifacts/az19_big128x6_iter950_params.npz --channels 128 --blocks 6 \
    --opp-ckpt artifacts/az19_big128x6_iter830_params.npz --opp-channels 128 --opp-blocks 6 \
    --board 19 --sims 32 --gumbel-m 16 --games 128 --opening-moves 6 \
    --chunk 64 --retries 2 2>&1 | tail -8

timeout 5400 python scripts/eval_ckpt.py \
    --ckpt artifacts/az19_big128x6_iter950_params.npz --channels 128 --blocks 6 \
    --board 19 --sims 32 --gumbel-m 16 --games 128 \
    --chunk 64 --retries 2 2>&1 | tail -6

# in-distribution value-head health at iter-950: the just-finished tree's
# replay is full of current-policy grounded rows
timeout 1800 python scripts/value_probe.py \
    --ckpt checkpoints/az19_big.npz --channels 128 --blocks 6 --board 19 \
    --replay-from checkpoints/az19_big.npz 2>&1 | tail -3
