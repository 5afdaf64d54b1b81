#!/bin/bash
# Round-5 verdict #4: attribute the Gumbel search B=512->1024 cliff
# (2.6x time for 2x batch; survives table packing) to NAMED components.
# Plan A is a jax.profiler device trace at both batch sizes; through the
# axon relay device tracing may be unavailable, so Plan B (sanctioned by
# the verdict) is the per-component loop-carried ablation at both batch
# sizes with the production 64ch x 3 search net.
set -x
cd /root/repo

# Plan A: profiler trace (non-fatal if the relay can't capture devices)
timeout 900 python scripts/cliff_trace.py --batch 512 || true
timeout 900 python scripts/cliff_trace.py --batch 1024 || true

# Plan B: component ablation at both sides of the cliff
timeout 900 python scripts/search_cost_ablation.py \
    --board 19 --batch 512 --sims 32 --channels 64 --blocks 3 \
    2>&1 | tee logs/cliff_ablation_512.log | tail -10
timeout 900 python scripts/search_cost_ablation.py \
    --board 19 --batch 1024 --sims 32 --channels 64 --blocks 3 \
    2>&1 | tee logs/cliff_ablation_1024.log | tail -10
