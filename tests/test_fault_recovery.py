"""Fault-injection recovery: kill one "host" of the 2-process harness
mid-run, restart the job from the checkpoint, and require bit-exact
continuation vs an uninterrupted run (SURVEY §5.3's scoped recovery story:
checkpoint-based restart; §5.4's resume-must-be-bit-exact contract).

Flow:
  phase 1: 2 processes run segment 0 of 2; process 0 checkpoints the
           (replicated) global states; process 1 then os._exit(1)s —
           an unannounced host death, no distributed shutdown.
  detect:  the launcher sees the nonzero exit (failure detection), tears
           down the wedged survivor (it blocks on the next collective with
           a dead peer), exactly like a pod supervisor would.
  phase 2: a fresh 2-process job restores from the checkpoint with
           --start-segment 1 and finishes the run.
  assert:  final-state checksums from phase 2 == a single-process
           uninterrupted segmented run (same per-segment fold_in keys).
"""

import json
import os
import socket
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BOARD, BATCH, STEPS, SEED, SEGMENTS = 5, 16, 24, 3, 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(pid: int, port: int, ckpt: str, start_segment: int,
            crash_after: int):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    argv = [
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
        "--num-segments", str(SEGMENTS),
        "--start-segment", str(start_segment),
        "--ckpt", ckpt,
    ]
    if crash_after >= 0 and pid == 1:
        argv += ["--crash-after-segment", str(crash_after)]
    return subprocess.Popen(argv, cwd=REPO, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)


def _uninterrupted_checksums():
    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.env.batch_env import BatchGoEnv

    cfg = EnvConfig(board_size=BOARD, batch_size=BATCH, auto_reset=True)
    env = BatchGoEnv(cfg)
    states = env.reset()
    seed_key = jax.random.PRNGKey(SEED)
    seg_steps = STEPS // SEGMENTS
    for seg in range(SEGMENTS):
        r = env.rollout(jax.random.fold_in(seed_key, seg), states, seg_steps)
        states = r.final_states
    return (
        int(jnp.sum(r.final_states.astype(jnp.int32))),
        int(jnp.sum(r.actions.astype(jnp.int32))),
        float(jnp.sum(r.rewards.astype(jnp.float32))),
    )


@pytest.mark.timeout(900)
@pytest.mark.slow
def test_kill_one_host_restart_from_checkpoint(tmp_path):
    ckpt = str(tmp_path / "fault_ckpt.npz")

    # ---- phase 1: segment 0 + simulated host death of process 1
    port = _free_port()
    p0 = _launch(0, port, ckpt, start_segment=0, crash_after=0)
    p1 = _launch(1, port, ckpt, start_segment=0, crash_after=0)
    # failure detection: the dying host exits nonzero on its own
    out1, err1 = p1.communicate(timeout=480)
    assert p1.returncode == 1, f"worker 1 should crash, got {p1.returncode}:\n{err1[-2000:]}"
    # the checkpoint must have landed before the crash
    deadline = time.time() + 120
    while not os.path.exists(ckpt) and time.time() < deadline:
        time.sleep(0.5)
    assert os.path.exists(ckpt), "checkpoint was not written before the crash"
    # the survivor is blocked on a collective with a dead peer (or has
    # errored out of it) — the supervisor tears the job down
    try:
        p0.wait(timeout=5)
    except subprocess.TimeoutExpired:
        p0.kill()
        p0.communicate()

    # ---- phase 2: fresh job resumes from the checkpoint
    port = _free_port()
    q0 = _launch(0, port, ckpt, start_segment=1, crash_after=-1)
    q1 = _launch(1, port, ckpt, start_segment=1, crash_after=-1)
    outs = []
    for q in (q0, q1):
        out, err = q.communicate(timeout=480)
        assert q.returncode == 0, f"resume worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    # both resumed processes agree ...
    assert outs[0]["state_checksum"] == outs[1]["state_checksum"]
    assert outs[0]["action_checksum"] == outs[1]["action_checksum"]
    assert outs[0]["reward_checksum"] == outs[1]["reward_checksum"]
    # ... and the continuation is bit-exact vs the uninterrupted run
    cs_state, cs_act, cs_rew = _uninterrupted_checksums()
    assert outs[0]["state_checksum"] == cs_state
    assert outs[0]["action_checksum"] == cs_act
    assert outs[0]["reward_checksum"] == cs_rew
