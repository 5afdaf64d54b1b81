"""Simulated multi-host validation: two OS processes, each owning 4 virtual
CPU devices, join via ``jax.distributed`` and run a rollout sharded over the
8-device global mesh.  Both processes must report identical checksums, and
those must be bit-identical to a single-process run of the same rollout —
the multi-host determinism contract (SURVEY §7.6: per-env RNG and samplers
are sharding-invariant, so host count cannot change trajectories).

The reference has no distributed layer at all (SURVEY §2.4/§5.8); this is
the closest a single machine gets to exercising the real pod-slice path
(process bootstrap, global meshes, cross-host array assembly).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes-scale; run with the full profile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BOARD, BATCH, STEPS, SEED = 5, 16, 24, 0


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_checksums():
    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.env.batch_env import BatchGoEnv

    cfg = EnvConfig(board_size=BOARD, batch_size=BATCH, auto_reset=True)
    env = BatchGoEnv(cfg)
    r = env.rollout(jax.random.PRNGKey(SEED), env.reset(), STEPS)
    return (
        int(jnp.sum(r.final_states.astype(jnp.int32))),
        int(jnp.sum(r.actions.astype(jnp.int32))),
        float(jnp.sum(r.rewards.astype(jnp.float32))),
    )


@pytest.mark.timeout(600)
def test_two_process_rollout_bit_exact():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu itself
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "scripts", "multiproc_worker.py"),
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2",
                "--process-id", str(pid),
                "--local-devices", "4",
                "--board", str(BOARD),
                "--batch", str(BATCH),
                "--steps", str(STEPS),
                "--seed", str(SEED),
            ],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    for o in outs:
        assert o["process_count"] == 2
        assert o["global_devices"] == 8
    # Both processes see identical replicated checksums ...
    assert outs[0]["state_checksum"] == outs[1]["state_checksum"]
    assert outs[0]["action_checksum"] == outs[1]["action_checksum"]
    assert outs[0]["reward_checksum"] == outs[1]["reward_checksum"]
    # ... and they match the single-process ground truth bit-exactly.
    cs_state, cs_act, cs_rew = _single_process_checksums()
    assert outs[0]["state_checksum"] == cs_state
    assert outs[0]["action_checksum"] == cs_act
    assert outs[0]["reward_checksum"] == cs_rew
