"""The pjit learner: AZ loss, optax update, mesh-sharded train step.

Gradient sync across the env/data axis and any tensor-parallel collectives
come from GSPMD: parameters carry NamedShardings (replicated or
model-axis-sharded, see models.az_net.param_shardings), batches are sharded
on the env axis, and XLA inserts the psum/all-gathers on ICI.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_train_state(params, learning_rate=1e-3, weight_decay=1e-4):
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32)), tx


def az_loss(params, apply_fn, obs, policy_target, value_target, mask,
            value_mask=None):
    """Masked cross-entropy on the policy + MSE on the value head.

    obs: (M, 6, N, N) canonical states; targets as in SelfPlayBatch, with
    leading dims flattened to M.  ``value_mask`` (optional, (M,) bool)
    additionally gates ONLY the value term — rows of a truncated game tail
    can then train the policy while contributing no value gradient
    (--value-grounded-only: the measured-sound regime when windows cover a
    small fraction of a game and bootstrap targets drift to a constant).
    """
    logits, value = apply_fn(params, obs)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # policy_target rows can contain -inf-masked softmaxes; they are valid
    # probability vectors (zeros at invalid moves).
    pi_loss = -jnp.sum(policy_target * logp, axis=-1)
    v_loss = jnp.square(value - value_target)
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    pi_loss = jnp.sum(pi_loss * m) / denom
    vm = m if value_mask is None else m * value_mask.astype(jnp.float32)
    v_denom = jnp.maximum(jnp.sum(vm), 1.0)
    v_loss = jnp.sum(v_loss * vm) / v_denom
    return pi_loss + v_loss, (pi_loss, v_loss)


def train_step(state: TrainState, tx, apply_fn, batch):
    """One SGD update.  ``batch`` = (obs, policy_target, value_target, mask)
    or the same plus a trailing value_mask, flattened leading dim."""
    obs, pi_t, v_t, mask, *rest = batch
    vmask = rest[0] if rest else None
    grad_fn = jax.value_and_grad(az_loss, has_aux=True)
    (loss, (pi_loss, v_loss)), grads = grad_fn(
        state.params, apply_fn, obs, pi_t, v_t, mask, vmask
    )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
    metrics = {"loss": loss, "policy_loss": pi_loss, "value_loss": v_loss}
    return new_state, metrics


def make_jitted_train_step(tx, apply_fn):
    return jax.jit(functools.partial(train_step, tx=tx, apply_fn=apply_fn))
