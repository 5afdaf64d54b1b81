"""Model-surgery tests: value-head reinit and Net2Net widen/deepen.

Function preservation is the contract: a widened+deepened net must
compute (to noise_scale / dtype tolerance) the same policy and value as
its parent, so training continues FROM the parent's strength."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymgo_tpu.core.state import batch_init_state
from gymgo_tpu.env.batch_env import rollout
from gymgo_tpu.config import EnvConfig
from gymgo_tpu.models import AZNet, AZNetConfig, init_params
from gymgo_tpu.models.surgery import (
    VALUE_HEAD_KEYS,
    reinit_value_head,
    widen_deepen,
    zero_moments_for,
)


def _boards(n=5, b=16, steps=12):
    cfg = EnvConfig(board_size=n, batch_size=b, auto_reset=True)
    return rollout(jax.random.PRNGKey(3), batch_init_state(b, n),
                   steps, cfg).final_states


@pytest.fixture(scope="module")
def boards5():
    return _boards()


def test_reinit_value_head_keeps_policy(boards5):
    cfg = AZNetConfig(board_size=5, channels=16, blocks=2)
    net = AZNet(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    new = reinit_value_head(params, jax.random.PRNGKey(9), cfg)
    p0, v0 = net.apply(params, boards5)
    p1, v1 = net.apply(new, boards5)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    assert not np.allclose(np.asarray(v0), np.asarray(v1))
    # final value layer zero-initialized: the re-init head starts NEUTRAL
    # (tanh(0) = 0 with live gradients) instead of saturating on a trained
    # trunk's large activations
    np.testing.assert_array_equal(np.asarray(v1), np.zeros(v1.shape[0]))
    # trunk + policy head untouched
    for k in params["params"]:
        pairs = zip(jax.tree_util.tree_leaves(params["params"][k]),
                    jax.tree_util.tree_leaves(new["params"][k]))
        all_same = all(np.array_equal(np.asarray(a), np.asarray(b))
                       for a, b in pairs)
        # head keys must change (bias leaves are zero in both inits, so
        # "all leaves equal" is the discriminator, not "first leaf")
        assert all_same != (k in VALUE_HEAD_KEYS)


def test_zero_moments_targets_only_head():
    import optax

    cfg = AZNetConfig(board_size=5, channels=16, blocks=1)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adamw(1e-3)
    opt = tx.init(params)
    # fake non-zero moments
    opt = jax.tree_util.tree_map(lambda x: x + 1.0, opt)
    fixed = zero_moments_for(opt, params)
    adam = fixed[0]  # ScaleByAdamState
    for k in params["params"]:
        mu_leaf = jax.tree_util.tree_leaves(adam.mu["params"][k])[0]
        if k in VALUE_HEAD_KEYS:
            assert float(jnp.abs(mu_leaf).max()) == 0.0
        else:
            assert float(jnp.abs(mu_leaf).min()) > 0.0


@pytest.mark.parametrize("new_ch,new_blocks", [(32, 2), (16, 4), (32, 4)])
def test_widen_deepen_preserves_function_f32(boards5, new_ch, new_blocks):
    old_cfg = AZNetConfig(board_size=5, channels=16, blocks=2,
                          dtype=jnp.float32)
    new_cfg = dataclasses.replace(old_cfg, channels=new_ch,
                                  blocks=new_blocks)
    params = init_params(jax.random.PRNGKey(1), old_cfg)
    grown = widen_deepen(params, old_cfg, new_cfg, jax.random.PRNGKey(2),
                         noise_scale=0.0)
    p0, v0 = AZNet(old_cfg).apply(params, boards5)
    p1, v1 = AZNet(new_cfg).apply(grown, boards5)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-4)


def test_widen_deepen_bf16_with_noise_stays_close(boards5):
    old_cfg = AZNetConfig(board_size=5, channels=16, blocks=2)  # bf16
    new_cfg = dataclasses.replace(old_cfg, channels=32, blocks=4)
    params = init_params(jax.random.PRNGKey(1), old_cfg)
    grown = widen_deepen(params, old_cfg, new_cfg, jax.random.PRNGKey(2),
                         noise_scale=1e-2)
    p0, v0 = AZNet(old_cfg).apply(params, boards5)
    p1, v1 = AZNet(new_cfg).apply(grown, boards5)
    # bf16 activations + symmetry-breaking noise: behaviorally identical
    # policies (same ranking almost everywhere), values within a few %.
    agree = np.mean(
        np.argmax(np.asarray(p0), -1) == np.argmax(np.asarray(p1), -1)
    )
    assert agree >= 0.9
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=0.1)


def test_widen_deepen_noise_breaks_gradient_symmetry(boards5):
    """Exact duplicates would get identical gradients forever; the noise
    must make duplicated channels' gradients differ."""
    import optax

    from gymgo_tpu.rl.learner import az_loss

    old_cfg = AZNetConfig(board_size=5, channels=16, blocks=1,
                          dtype=jnp.float32)
    new_cfg = dataclasses.replace(old_cfg, channels=32)
    params = init_params(jax.random.PRNGKey(1), old_cfg)
    grown = widen_deepen(params, old_cfg, new_cfg, jax.random.PRNGKey(2),
                         noise_scale=1e-2)
    net = AZNet(new_cfg)
    b = boards5.shape[0]
    pi_t = jnp.full((b, 26), 1.0 / 26)
    v_t = jnp.ones((b,))
    mask = jnp.ones((b,), bool)
    grads = jax.grad(
        lambda p: az_loss(p, net.apply, boards5, pi_t, v_t, mask)[0]
    )(grown)
    g = np.asarray(grads["params"]["ResBlock_0"]["Conv_0"]["kernel"])
    # group-aware layout: new group g spans [g*4:(g+1)*4] originals then
    # [.. +4] copies on the OUTPUT axis (16ch/8 groups -> gs=2; 32ch -> 4)
    orig, copy = g[..., 0:2], g[..., 2:4]
    assert not np.allclose(orig, copy)


def test_widen_deepen_stable_after_update(boards5):
    """Regression: one optimizer step must not collapse the grown net.
    The original deepening recipe zeroed the new blocks' second CONV —
    but GroupNorm downstream of a zero tensor renormalizes the first
    update's ~lr-sized output to UNIT variance, injecting O(1) noise per
    block regardless of lr (measured on the 19x19 flagship growth).  The
    zero-GAMMA recipe keeps the perturbation O(lr)."""
    import optax

    from gymgo_tpu.rl.learner import az_loss

    old_cfg = AZNetConfig(board_size=5, channels=16, blocks=1,
                          dtype=jnp.float32)
    new_cfg = dataclasses.replace(old_cfg, channels=32, blocks=4)
    params = init_params(jax.random.PRNGKey(1), old_cfg)
    grown = widen_deepen(params, old_cfg, new_cfg, jax.random.PRNGKey(2),
                         noise_scale=1e-2)

    b = boards5.shape[0]
    pi_t = jnp.full((b, 26), 1.0 / 26)
    v_t = jnp.ones((b,))
    mask = jnp.ones((b,), bool)

    def one_step_shift(cfg, p):
        net = AZNet(cfg)
        p_ref, _ = net.apply(p, boards5)
        tx = optax.adamw(1e-3)
        opt = tx.init(p)
        grads = jax.grad(
            lambda q: az_loss(q, net.apply, boards5, pi_t, v_t, mask)[0]
        )(p)
        updates, _ = tx.update(grads, opt, p)
        p_new, _ = net.apply(optax.apply_updates(p, updates), boards5)
        return float(jnp.max(jnp.abs(p_new - p_ref)))

    # fresh-adamw's first step moves every param by ~lr; the PARENT's
    # resulting output shift is the honest yardstick for "normal"
    parent_shift = one_step_shift(old_cfg, params)
    grown_shift = one_step_shift(new_cfg, grown)
    assert grown_shift < 4.0 * parent_shift + 1e-3, (
        grown_shift, parent_shift)


@pytest.mark.slow
def test_train_cli_surgery_roundtrip(tmp_path):
    """End-to-end CLI regression for the round-4 surgery workflow:
    train -> resume with --reinit-value-head -> net2net growth ->
    resume at the grown architecture.  Exercises the exact flag wiring
    production runs use (board 5 / tiny nets / 2-iter segments)."""
    import subprocess
    import sys

    ck = tmp_path / "t.npz"
    big = tmp_path / "big.npz"
    base = [sys.executable, "train.py", "--board", "5", "--envs", "8",
            "--rollout-steps", "8", "--cpu", "--value-grounded-only",
            "--replay-capacity", "1024"]

    def run(args):
        r = subprocess.run(base + args, capture_output=True, text=True,
                           timeout=600, cwd=".")
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    run(["--channels", "16", "--blocks", "1", "--iters", "2",
         "--checkpoint", str(ck)])
    out = run(["--channels", "16", "--blocks", "1", "--iters", "4",
               "--checkpoint", str(ck), "--resume", str(ck),
               "--reinit-value-head"])
    assert "value head re-initialized" in out

    g = subprocess.run(
        [sys.executable, "scripts/net2net.py", "--in", str(ck),
         "--out", str(big), "--board", "5", "--envs", "8",
         "--channels", "16", "--blocks", "1", "--new-channels", "32",
         "--new-blocks", "2", "--replay-capacity", "1024"],
        capture_output=True, text=True, timeout=600, cwd=".")
    assert g.returncode == 0, g.stderr[-2000:]
    out = run(["--channels", "32", "--blocks", "2", "--iters", "6",
               "--checkpoint", str(big), "--resume", str(big)])
    assert "resumed from" in out and "iter 5" in out


@pytest.mark.slow
def test_params_to_ckpt_resume_roundtrip(tmp_path):
    """Artifact-recovery lifecycle: train -> export params-only artifact
    -> params_to_ckpt re-seeds a full resume tree -> train.py resumes at
    the requested iteration.  This is the disaster path for when the
    gitignored checkpoints/ tree is lost and only committed artifacts
    remain (it happened)."""
    import subprocess
    import sys

    ck = tmp_path / "t.npz"
    art = tmp_path / "params.npz"
    reseed = tmp_path / "reseeded.npz"
    base = [sys.executable, "train.py", "--board", "5", "--envs", "8",
            "--rollout-steps", "8", "--cpu", "--channels", "16",
            "--blocks", "1", "--replay-capacity", "1024"]

    def run(cmd):
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=600, cwd=".")
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    run(base + ["--iters", "2", "--checkpoint", str(ck)])
    run([sys.executable, "scripts/export_params.py", "--ckpt", str(ck),
         "--out", str(art), "--board", "5", "--channels", "16",
         "--blocks", "1"])
    out = run([sys.executable, "scripts/params_to_ckpt.py",
               "--params", str(art), "--out", str(reseed),
               "--board", "5", "--envs", "8", "--channels", "16",
               "--blocks", "1", "--iteration", "2", "--lr", "1e-3",
               "--replay-capacity", "1024"])
    assert "iteration 2" in out
    out = run(base + ["--iters", "4", "--checkpoint", str(reseed),
                      "--resume", str(reseed)])
    # numbering continues where the artifact's line left off
    assert "resumed from" in out and "at iteration 2" in out
    assert "iter 3" in out and "iter 2" in out
