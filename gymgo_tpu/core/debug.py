"""Debug-mode wrappers (SURVEY §5.2): checkify'd stepping and NaN guards.

JAX's functional purity removes the reference's in-place-mutation hazards by
construction; what remains worth guarding is bad *input* (out-of-range or
invalid actions fed to the jitted step, which the production path silently
freezes + flags).  ``checked_step`` promotes those flags to checkify errors
that surface host-side, for use in tests and debugging sessions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from gymgo_tpu.core import step as _step


def checked_step(states, actions):
    """step_states wrapped in checkify: errors on invalid actions or
    stepping finished games instead of silently freezing."""

    def inner(states, actions):
        new_states, info = _step.step_states(states, actions)
        checkify.check(
            ~jnp.any(info.invalid_action), "invalid action(s) in batch"
        )
        checkify.check(
            ~jnp.any(info.was_done), "stepped finished game(s) in batch"
        )
        return new_states, info

    return checkify.checkify(inner)(states, actions)


def enable_nan_debugging():
    """Turn on global NaN checks (tests / debugging only — disables fusion
    benefits)."""
    jax.config.update("jax_debug_nans", True)
