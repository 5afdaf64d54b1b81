"""Structural scaling evidence: the compiled sharded step/rollout contains
NO cross-device collectives.

The BASELINE north star (>=90% linear host scaling, /root/repo/BASELINE.json)
cannot be measured without a pod; the strongest hardware-free substitute is
asserting the property that *implies* near-linear scaling — Go envs are
embarrassingly parallel (SURVEY.md §5.8), so the SPMD-partitioned step must
not emit a single all-reduce / all-gather / collective-permute /
all-to-all / reduce-scatter.  These tests compile the real sharded step and
the full scan rollout on the 8-way virtual CPU mesh and grep the optimized
HLO.  They also pin weak scaling structurally: the per-device parameter
shapes are exactly global_batch/num_devices, independent of batch size.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from gymgo_tpu.config import EnvConfig
from gymgo_tpu.core import state as _state
from gymgo_tpu.env import batch_env as _batch_env
from gymgo_tpu.parallel import env_sharding, make_mesh, shard_states

COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "collective-permute",
    "all-to-all",
    "reduce-scatter",
    "collective-broadcast",
    "ragged-all-to-all",
)


def _compiled_hlo(fn, *args, **jit_kw):
    return jax.jit(fn, **jit_kw).lower(*args).compile().as_text()


def _assert_collective_free(hlo: str, what: str):
    found = [op for op in COLLECTIVE_OPS if op in hlo]
    assert not found, f"{what}: collectives in compiled HLO: {found}"


def _sharded_args(cfg, mesh):
    states = shard_states(_state.batch_init_state(cfg.batch_size, cfg.board_size), mesh)
    actions = jax.device_put(
        jnp.zeros((cfg.batch_size,), jnp.int32), env_sharding(mesh, 1)
    )
    return states, actions


def test_sharded_step_has_no_collectives():
    cfg = EnvConfig(board_size=9, batch_size=32, auto_reset=True)
    mesh = make_mesh()
    states, actions = _sharded_args(cfg, mesh)
    step = _batch_env.shard_over_envs(
        lambda s, a: _batch_env.batch_step(s, a, config=cfg), mesh
    )
    hlo = _compiled_hlo(step, states, actions)
    _assert_collective_free(hlo, "batch_step")


def test_sharded_rollout_scan_has_no_collectives():
    cfg = EnvConfig(board_size=9, batch_size=32, auto_reset=True)
    mesh = make_mesh()
    states, _ = _sharded_args(cfg, mesh)

    def roll(key, s):
        return _batch_env.rollout(key, s, 16, cfg, mesh=mesh)

    hlo = _compiled_hlo(roll, jax.random.PRNGKey(0), states)
    _assert_collective_free(hlo, "rollout(scan)")


@pytest.mark.parametrize("batch", [16, 64])
def test_weak_scaling_per_device_shapes(batch):
    """The partitioner must split the env axis: per-device state parameter
    shape is exactly (batch/8, 6, N, N), so per-device work is constant when
    batch scales with device count (weak scaling)."""
    cfg = EnvConfig(board_size=7, batch_size=batch, auto_reset=True)
    mesh = make_mesh()
    ndev = len(jax.devices())
    states, actions = _sharded_args(cfg, mesh)
    step = _batch_env.shard_over_envs(
        lambda s, a: _batch_env.batch_step(s, a, config=cfg), mesh
    )
    hlo = _compiled_hlo(step, states, actions)
    per_dev = batch // ndev
    shard_shape = rf"s8\[{per_dev},6,{cfg.board_size},{cfg.board_size}\]"
    assert re.search(shard_shape, hlo), (
        f"expected per-device state shard {per_dev}x6x{cfg.board_size}^2 "
        "in compiled HLO parameters"
    )
    # the GLOBAL shape must not appear as a computation operand (that would
    # mean the partitioner replicated the batch instead of splitting it).
    full_shape = rf"s8\[{batch},6,{cfg.board_size},{cfg.board_size}\]"
    body = hlo.split("ENTRY", 1)[-1]
    assert not re.search(full_shape, body), (
        "global-batch state tensor found inside the partitioned module body"
    )
