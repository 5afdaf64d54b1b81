"""AlphaZero-style convolutional policy/value network for Go self-play.

The reference framework carries no model (it is an environment package); the
BASELINE configs (configs[4]) call for an on-device actor-learner with a
small AZ-style conv net.  Design is TPU-first:

  * NHWC layout, bfloat16 activations — XLA tiles convs onto the MXU.
  * channel counts in MXU-friendly multiples (default 128).
  * residual trunk with fused conv+groupnorm+relu blocks.
  * policy head -> (N*N + 1) move logits; value head -> tanh scalar.
  * ``param_shardings`` maps parameters onto a ('model',) mesh axis for
    tensor-parallel learners: conv kernels shard on the output-channel dim,
    the next layer's input-channel contraction induces the matching
    all-reduce via GSPMD.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gymgo_tpu import govars


@dataclasses.dataclass(frozen=True)
class AZNetConfig:
    board_size: int
    channels: int = 128
    blocks: int = 6
    policy_channels: int = 8
    value_channels: int = 8
    dtype: Any = jnp.bfloat16


class ResBlock(nn.Module):
    channels: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(h)
        return nn.relu(x + h)


class AZNet(nn.Module):
    """Input: int8/float states (B, 6, N, N); output: (policy_logits, value)."""

    config: AZNetConfig

    @nn.compact
    def __call__(self, states):
        cfg = self.config
        n = cfg.board_size
        # NCHW (env layout) -> NHWC (TPU conv layout)
        x = jnp.transpose(states.astype(cfg.dtype), (0, 2, 3, 1))
        x = nn.Conv(cfg.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=cfg.dtype)(x)
        x = nn.GroupNorm(num_groups=8, dtype=cfg.dtype)(x)
        x = nn.relu(x)
        for _ in range(cfg.blocks):
            x = ResBlock(cfg.channels, cfg.dtype)(x)

        # Policy head: 1x1 conv -> flatten -> board logits + pass logit.
        p = nn.Conv(cfg.policy_channels, (1, 1), dtype=cfg.dtype)(x)
        p = nn.relu(p)
        p = p.reshape(p.shape[0], -1)
        policy_logits = nn.Dense(n * n + 1, dtype=cfg.dtype)(p)

        # Value head: 1x1 conv -> flatten -> MLP -> tanh.
        v = nn.Conv(cfg.value_channels, (1, 1), dtype=cfg.dtype)(x)
        v = nn.relu(v)
        v = v.reshape(v.shape[0], -1)
        v = nn.relu(nn.Dense(cfg.channels, dtype=cfg.dtype)(v))
        value = jnp.tanh(nn.Dense(1, dtype=jnp.float32)(v))[:, 0]

        return policy_logits.astype(jnp.float32), value


def init_params(key: jax.Array, config: AZNetConfig):
    net = AZNet(config)
    dummy = jnp.zeros(
        (1, govars.NUM_CHNLS, config.board_size, config.board_size), jnp.int8
    )
    return net.init(key, dummy)


def param_shardings(params, mesh: Mesh, model_axis: str = "model"):
    """Tensor-parallel sharding rules: shard the trailing (output) dim of
    every kernel whose size divides the model axis; replicate the rest."""
    axis = mesh.shape[model_axis]

    def rule(path, p):
        if p.ndim >= 2 and p.shape[-1] % axis == 0 and axis > 1:
            spec = [None] * (p.ndim - 1) + [model_axis]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
