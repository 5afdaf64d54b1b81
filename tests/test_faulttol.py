"""Fault-tolerant eval harness (gymgo_tpu/utils/faulttol.py).

The TPU worker kernel-faults mid-eval flakily (rounds 3-4); the harness
must make a crash cost one chunk, not the eval.  Fast tests drive the
ledger/supervisor logic with a jax-free fake child; the slow test runs
the real scripts/eval_ckpt.py CLI through an injected worker kill and
checks the supervised totals are IDENTICAL to an uninterrupted run
(chunk RNG is keyed by chunk index, so redone chunks replay the same
games).
"""

import os
import subprocess
import sys
import textwrap

import pytest

from gymgo_tpu.utils import faulttol

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ledger_roundtrip(tmp_path):
    path = str(tmp_path / "state.jsonl")
    assert faulttol.load_ledger(path) == {}
    faulttol.append_chunk(path, "0", {"wins": 3})
    faulttol.append_chunk(path, "i1-j2-c0", {"wins": 1})
    led = faulttol.load_ledger(path)
    assert led["0"]["wins"] == 3
    assert led["i1-j2-c0"]["wins"] == 1


def test_ledger_tolerates_torn_final_line(tmp_path):
    path = str(tmp_path / "state.jsonl")
    faulttol.append_chunk(path, "0", {"wins": 3})
    with open(path, "a") as f:
        f.write('{"chunk": "1", "wi')  # crash mid-append
    led = faulttol.load_ledger(path)
    assert set(led) == {"0"}


def test_ledger_redo_overwrites(tmp_path):
    path = str(tmp_path / "state.jsonl")
    faulttol.append_chunk(path, "0", {"wins": 1})
    faulttol.append_chunk(path, "0", {"wins": 2})
    assert faulttol.load_ledger(path)["0"]["wins"] == 2


FAKE_CHILD = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    from gymgo_tpu.utils import faulttol
    state = sys.argv[1]
    led = faulttol.load_ledger(state)
    for i in range(3):
        if str(i) in led:
            continue
        faulttol.append_chunk(state, str(i), {{"wins": i * 10}})
""")


def _write_child(tmp_path):
    child = tmp_path / "fake_child.py"
    child.write_text(FAKE_CHILD.format(repo=REPO))
    return str(child)


def test_supervise_recovers_from_one_crash(tmp_path, monkeypatch):
    state = str(tmp_path / "state.jsonl")
    marker = str(tmp_path / "crashed.marker")
    child = _write_child(tmp_path)
    monkeypatch.setenv(faulttol.CRASH_AT_ENV, "1")
    monkeypatch.setenv(faulttol.CRASH_MARKER_ENV, marker)
    probes = []
    monkeypatch.setattr(faulttol, "wait_for_device",
                        lambda *a, **k: probes.append(1) or True)
    led = faulttol.supervise(
        [sys.executable, child, state], state,
        expected_chunks=["0", "1", "2"], max_retries=2)
    assert os.path.exists(marker), "injected crash never fired"
    assert probes == [1], "supervisor should probe exactly once"
    assert {k: v["wins"] for k, v in led.items()} == {
        "0": 0, "1": 10, "2": 20}


def test_supervise_gives_up_after_retries(tmp_path, monkeypatch):
    state = str(tmp_path / "state.jsonl")
    child = _write_child(tmp_path)
    # crash every time: marker env unset -> maybe_crash always fires
    monkeypatch.setenv(faulttol.CRASH_AT_ENV, "1")
    monkeypatch.delenv(faulttol.CRASH_MARKER_ENV, raising=False)
    monkeypatch.setattr(faulttol, "wait_for_device", lambda *a, **k: True)
    with pytest.raises(RuntimeError, match="incomplete"):
        faulttol.supervise(
            [sys.executable, child, state], state,
            expected_chunks=["0", "1", "2"], max_retries=1)
    # chunk 0 completed before every crash; never lost
    assert faulttol.load_ledger(state)["0"]["wins"] == 0


def test_supervise_aborts_when_device_stays_down(tmp_path, monkeypatch):
    state = str(tmp_path / "state.jsonl")
    child = _write_child(tmp_path)
    monkeypatch.setenv(faulttol.CRASH_AT_ENV, "1")
    monkeypatch.delenv(faulttol.CRASH_MARKER_ENV, raising=False)
    monkeypatch.setattr(faulttol, "wait_for_device", lambda *a, **k: False)
    with pytest.raises(RuntimeError, match="unreachable"):
        faulttol.supervise(
            [sys.executable, child, state], state,
            expected_chunks=["0", "1", "2"], max_retries=3)


def test_maybe_crash_ignores_other_chunks(monkeypatch):
    monkeypatch.setenv(faulttol.CRASH_AT_ENV, "7")
    faulttol.maybe_crash("3")  # must not exit


def test_probe_device_cpu():
    assert faulttol.probe_device(timeout_s=120.0, cpu=True)


def test_probe_device_timeout(monkeypatch):
    # a probe that can never finish in time reports unreachable
    assert not faulttol.probe_device(timeout_s=0.001, cpu=True)


@pytest.mark.slow
def test_eval_ckpt_cli_survives_injected_worker_kill(tmp_path):
    """End-to-end: supervised eval_ckpt completes across a worker kill
    and matches an uninterrupted run bit-for-bit (VERDICT round-4 #2
    done-criterion, CPU-simulated)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gymgo_tpu.models import AZNetConfig, init_params
    from gymgo_tpu.utils import checkpoint as ckpt

    netcfg = AZNetConfig(board_size=5, channels=8, blocks=1)
    ck = str(tmp_path / "tiny.npz")
    ckpt.save_npz(ck, {"params": init_params(jax.random.PRNGKey(1), netcfg)})

    def run(state_file, env_extra):
        env = dict(os.environ, **env_extra)
        if not env_extra:
            env.pop(faulttol.CRASH_AT_ENV, None)
            env.pop(faulttol.CRASH_MARKER_ENV, None)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "eval_ckpt.py"),
             "--ckpt", ck, "--board", "5", "--channels", "8", "--blocks", "1",
             "--sims", "4", "--gumbel-m", "4", "--games", "8", "--chunk", "4",
             "--cpu", "--retries", "2", "--state-file", state_file],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stderr[-3000:]
        return r.stdout

    marker = str(tmp_path / "crash.marker")
    out_crashed = run(str(tmp_path / "crashed.jsonl"),
                      {faulttol.CRASH_AT_ENV: "1",
                       faulttol.CRASH_MARKER_ENV: marker})
    assert os.path.exists(marker), "injected kill never fired"
    out_clean = run(str(tmp_path / "clean.jsonl"), {})

    led_a = faulttol.load_ledger(str(tmp_path / "crashed.jsonl"))
    led_b = faulttol.load_ledger(str(tmp_path / "clean.jsonl"))
    fields = ("wins", "losses", "ties", "unfinished",
              "scored_wins", "scored_losses")
    for k in ("0", "1"):
        a = {f: led_a[k][f] for f in fields}
        b = {f: led_b[k][f] for f in fields}
        assert a == b, (k, a, b)
    assert "winrate=" in out_crashed and "winrate=" in out_clean
