"""State transforms: canonicalization and the 8 dihedral board symmetries.

Parity targets: /root/reference/gym_go/gogame.py:313-382.  The symmetry
orientation encoding (bit0 = flip last axis, bit1 = flip middle axis,
bit2 = rot90 over the board axes, applied in that order) matches the
reference so augmentation pipelines can be compared index-for-index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gymgo_tpu import govars

__all__ = [
    "canonical_form",
    "batch_canonical_form",
    "apply_symmetry",
    "all_symmetries",
    "random_symmetry",
]

_SWAP = [govars.WHITE, govars.BLACK, govars.TURN_CHNL, govars.INVD_CHNL,
         govars.PASS_CHNL, govars.DONE_CHNL]


def batch_canonical_form(states: jax.Array) -> jax.Array:
    """Make the player to move always be channel BLACK with turn 0.

    For envs where white is to move: swap the color planes and flip the turn
    plane (gogame.py:313-321).  Idempotent.
    """
    white_to_move = states[:, govars.TURN_CHNL, 0, 0] != 0
    swapped = states[:, jnp.array(_SWAP)]
    swapped = swapped.at[:, govars.TURN_CHNL].set(
        1 - states[:, govars.TURN_CHNL]
    )
    return jnp.where(white_to_move[:, None, None, None], swapped, states)


def canonical_form(state: jax.Array) -> jax.Array:
    """Single-state canonicalization: ``(6, N, N) -> (6, N, N)``."""
    return batch_canonical_form(state[None])[0]


def apply_symmetry(image: jax.Array, orientation) -> jax.Array:
    """Apply dihedral symmetry ``orientation`` in [0, 8) over the last 2 axes.

    bit0: flip axis -1; bit1: flip axis -2; bit2: rot90 (axes (-2, -1)),
    composed in that order — matching gogame.py:346-358.  ``orientation`` may
    be traced (selected with ``lax.switch``-free where-chains so it vmaps).
    """
    orientation = jnp.asarray(orientation, jnp.int32)
    h = (orientation >> 0) % 2 == 1
    v = (orientation >> 1) % 2 == 1
    r = (orientation >> 2) % 2 == 1
    out = jnp.where(h, jnp.flip(image, axis=-1), image)
    out = jnp.where(v, jnp.flip(out, axis=-2), out)
    out = jnp.where(r, jnp.rot90(out, axes=(-2, -1)), out)
    return out


def all_symmetries(image: jax.Array) -> jax.Array:
    """All 8 orientations, stacked on a new leading axis (gogame.py:361-382)."""
    return jnp.stack([apply_symmetry(image, i) for i in range(8)], axis=0)


def random_symmetry(key: jax.Array, image: jax.Array) -> jax.Array:
    """One of the 8 orientations, chosen with ``jax.random`` (the production
    analog of the reference's global-``np.random`` draw at gogame.py:340-358)."""
    orientation = jax.random.randint(key, (), 0, 8)
    return apply_symmetry(image, orientation)
