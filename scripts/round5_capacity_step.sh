#!/bin/bash
# Round-5 stretch (round-4 verdict #6): second Net2Net capacity step.
#
# Width growth must be an integer factor (models/surgery.py:144 —
# group-aware duplication), so 128ch can only double to 256ch (~4x conv
# FLOPs, ~150s/iter at --envs 512: over the verdict's ~60s/iter bar).
# The affordable second step is DEPTH-only: 128ch x 6 -> 128ch x 9
# (~1.5x FLOPs, est. ~55s/iter) — new blocks enter as zero-gamma
# identity blocks (the measured-safe recipe from round 4), so the grown
# net is function-identical to its parent at step 0.
#
# Chain: grow iter-950 tree -> sanity (argmax parity on real boards is
# asserted inside net2net.py) -> train a 60-iter segment at the
# validated recipe -> export + h2h vs the 128x6 parent + vs random.
set -ex
cd /root/repo

python - <<'EOF'
import numpy as np
z = np.load("checkpoints/az19_big.npz")
it = int(z["iteration::0"])
assert it == 950, f"resume tree at iteration {it}, expected 950"
EOF

timeout 1200 python scripts/net2net.py --in checkpoints/az19_big.npz \
    --out checkpoints/az19_deep.npz --board 19 --envs 512 \
    --channels 128 --blocks 6 --new-channels 128 --new-blocks 9

# function-preservation on REAL boards (the round-4 done criterion),
# CPU-side: the zero-gamma identity blocks must leave policy argmax and
# value essentially unchanged on mid-game 19x19 positions.
timeout 1800 python - <<'EOF'
import jax, numpy as np
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from gymgo_tpu.core.state import batch_init_state
from gymgo_tpu.env.batch_env import rollout
from gymgo_tpu.config import EnvConfig
from gymgo_tpu.models import AZNet, AZNetConfig, init_params
from gymgo_tpu.rl import ReplayBuffer, make_train_state
from gymgo_tpu.utils import checkpoint as ckpt

def load(path, blocks):
    cfg = AZNetConfig(board_size=19, channels=128, blocks=blocks)
    params = init_params(jax.random.PRNGKey(0), cfg)
    st, _ = make_train_state(params, learning_rate=1e-3)
    tmpl = {"params": params, "opt_state": st.opt_state, "step": st.step,
            "buf": ReplayBuffer(1 << 16, 19).init(),
            "env_states": batch_init_state(512, 19),
            "key": jax.random.PRNGKey(0), "iteration": jnp.asarray(0),
            "target_params": params}
    return ckpt.restore_npz(path, tmpl)["params"], cfg

p6, c6 = load("checkpoints/az19_big.npz", 6)
p9, c9 = load("checkpoints/az19_deep.npz", 9)
states = rollout(jax.random.PRNGKey(7),
                 batch_init_state(64, 19), 80,
                 EnvConfig(board_size=19, batch_size=64)).final_states
pi6, v6 = AZNet(c6).apply(p6, states)
pi9, v9 = AZNet(c9).apply(p9, states)
agree = float(np.mean(np.argmax(np.asarray(pi6), -1)
                      == np.argmax(np.asarray(pi9), -1)))
dv = float(np.max(np.abs(np.asarray(v6) - np.asarray(v9))))
print(f"growth check: argmax agreement {agree:.3f}, max |dv| {dv:.4f}")
assert agree >= 0.95, agree
assert dv <= 0.1, dv
EOF

timeout 7200 python train.py --board 19 --envs 512 --rollout-steps 160 \
    --iters 1010 --channels 128 --blocks 9 --lr 2e-4 \
    --gumbel-sims 32 --gumbel-m 16 --augment --value-grounded-only \
    --checkpoint-every 10 \
    --checkpoint checkpoints/az19_deep.npz \
    --resume checkpoints/az19_deep.npz 2>&1 | tail -70

timeout 600 python scripts/export_params.py \
    --ckpt checkpoints/az19_deep.npz \
    --out artifacts/az19_deep128x9_iter1010_params.npz --board 19 \
    --channels 128 --blocks 9

timeout 7200 python scripts/eval_ckpt.py \
    --ckpt artifacts/az19_deep128x9_iter1010_params.npz --channels 128 --blocks 9 \
    --opp-ckpt artifacts/az19_big128x6_iter950_params.npz --opp-channels 128 --opp-blocks 6 \
    --board 19 --sims 32 --gumbel-m 16 --games 128 --opening-moves 6 \
    --chunk 64 --retries 2 2>&1 | tail -8

timeout 5400 python scripts/eval_ckpt.py \
    --ckpt artifacts/az19_deep128x9_iter1010_params.npz --channels 128 --blocks 9 \
    --board 19 --sims 32 --gumbel-m 16 --games 128 \
    --chunk 64 --retries 2 2>&1 | tail -6
