"""Fast flood-fill: flattened layout + log-doubling segmented sweeps.

Same fixpoints as ``gymgo_tpu.core.flood`` (the simple reference
implementation), reached far faster on TPU:

  * Boards are flattened to ``(B, N*N)`` so the long dim sits on vector
    lanes (a (B, 19, 19) layout leaves ~85% of each 128-wide lane tile
    empty; 361 packs ~3 tiles).
  * One "sweep" propagates values along *entire* straight row/col runs via
    Hillis-Steele doubling (5 levels for N<=32): val ← op(val,
    shift(val, 2^k·dir) gated by run-connectivity masks, themselves built by
    doubling).  The outer ``lax.while_loop`` then only needs one iteration
    per *bend* in a group's geodesic instead of one per cell, cutting
    steady-state trip counts ~10x.
  * Connectivity masks for the two-color min/max flood are shared: a chain
    of same-color adjacent pairs is monochrome, so a single pair-compat mask
    (black-black or white-white) serves both colors at once.

Exactness: each sweep is a monotone operator whose fixpoints are exactly the
connected-component closures (it propagates only within compat runs, and the
while_loop exits only when nothing changes), so results are bit-identical to
the simple implementation — enforced by tests/test_flood_equivalence.py and
the reference-parity suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["flood_or_fast", "flood_min_max_two_colors_fast"]


@functools.lru_cache(maxsize=None)
def _static(n: int):
    """Per-board-size constants: (direction, level) -> (roll, invalid mask).

    Masks are cached as *numpy* arrays (device constants would leak tracers
    across jit traces); jnp ops consume them as constants at trace time.
    """
    m = n * n
    col = np.arange(m) % n
    row = np.arange(m) // n
    levels = []
    d = 1
    while d < n:
        levels.append(d)
        d *= 2
    dirs = []
    for axis, idx in (("col", col), ("row", row)):
        stride = 1 if axis == "col" else n
        for sign in (1, -1):
            per_level = []
            for d in levels:
                roll = sign * d * stride
                if sign > 0:
                    invalid = idx < d
                else:
                    invalid = idx >= n - d
                per_level.append((roll, invalid))
            dirs.append(tuple(per_level))
    return tuple(dirs)


def _shift_flat(x, roll, invalid, fill):
    y = jnp.roll(x, roll, axis=-1)
    return jnp.where(invalid, fill, y)


def _build_conns(pair_compat_fn, n: int):
    """conns[dir][k]: cell j can receive from j - 2^k·dir through an
    unbroken compat run.  ``pair_compat_fn(a, b) -> (B, M) bool`` evaluates
    compatibility of each cell with its shifted neighbor."""
    dirs = _static(n)
    false = jnp.zeros((), jnp.bool_)
    conns = []
    for per_level in dirs:
        roll0, invalid0 = per_level[0]
        c = pair_compat_fn(roll0, invalid0)
        level_conns = [c]
        for (roll, invalid) in per_level[:-1]:
            c = c & _shift_flat(c, roll, invalid, false)
            level_conns.append(c)
        conns.append(level_conns)
    return dirs, conns


def _sweep(val, dirs, conns, combine, fill):
    for per_level, level_conns in zip(dirs, conns):
        for (roll, invalid), conn in zip(per_level, level_conns):
            shifted = _shift_flat(val, roll, invalid, fill)
            val = combine(val, jnp.where(conn, shifted, fill))
    return val


def flood_or_fast(seed: jax.Array, mask: jax.Array) -> jax.Array:
    """OR-flood of (bit-packed) ``seed`` through components of ``mask``.

    seed: bool or uint8 bit-mask (B, N, N); mask: bool (B, N, N).
    """
    b, n, _ = seed.shape[-3], seed.shape[-1], seed.shape[-2]
    flat_seed = seed.reshape(*seed.shape[:-2], n * n)
    flat_mask = mask.reshape(*mask.shape[:-2], n * n)
    if seed.dtype == jnp.bool_:
        gate = flat_mask
        x0 = flat_seed & flat_mask
    else:
        gate = jnp.where(flat_mask, ~jnp.zeros((), seed.dtype), jnp.zeros((), seed.dtype))
        x0 = flat_seed & gate
    fill = jnp.zeros((), seed.dtype)

    def compat(roll, invalid):
        return flat_mask & _shift_flat(flat_mask, roll, invalid, jnp.zeros((), jnp.bool_))

    dirs, conns = _build_conns(compat, n)

    def cond(c):
        return c[1]

    def body(c):
        x, _ = c
        nx = _sweep(x, dirs, conns, jnp.bitwise_or, fill)
        return nx, jnp.any(nx != x)

    out, _ = lax.while_loop(cond, body, (x0, jnp.array(True)))
    return out.reshape(seed.shape)


def flood_min_max_two_colors_fast(
    seed_min: jax.Array,
    seed_max: jax.Array,
    color_a: jax.Array,
    color_b: jax.Array,
    big: int,
):
    """(min, max) propagation within same-color components; see
    flood.flood_min_max_two_colors for the contract.  Values are int16
    internally (indices < 2^15 for N <= 19x19... any N <= 181)."""
    n = seed_min.shape[-1]
    shape = seed_min.shape
    mn = seed_min.astype(jnp.int16).reshape(*shape[:-2], n * n)
    mx = seed_max.astype(jnp.int16).reshape(*shape[:-2], n * n)
    a = color_a.reshape(*shape[:-2], n * n)
    bmask = color_b.reshape(*shape[:-2], n * n)
    big_v = jnp.int16(big)
    small_v = jnp.int16(-1)
    fbool = jnp.zeros((), jnp.bool_)

    def compat(roll, invalid):
        sa = _shift_flat(a, roll, invalid, fbool)
        sb = _shift_flat(bmask, roll, invalid, fbool)
        return (a & sa) | (bmask & sb)

    dirs, conns = _build_conns(compat, n)

    def cond(c):
        return c[2]

    def body(c):
        cmn, cmx, _ = c
        nmn = _sweep(cmn, dirs, conns, jnp.minimum, big_v)
        nmx = _sweep(cmx, dirs, conns, jnp.maximum, small_v)
        return nmn, nmx, jnp.any((nmn != cmn) | (nmx != cmx))

    mn, mx, _ = lax.while_loop(cond, body, (mn, mx, jnp.array(True)))
    return (
        mn.reshape(shape).astype(seed_min.dtype),
        mx.reshape(shape).astype(seed_max.dtype),
    )


def flood_min_max_two_colors_hybrid(
    seed_min: jax.Array,
    seed_max: jax.Array,
    color_a: jax.Array,
    color_b: jax.Array,
    big: int,
    num_sweeps: int | None = None,
    unroll: int = 1,
):
    """Fastest exact variant: a fixed number of long-range segmented sweeps
    (no convergence checks — each resolves whole straight runs, so ~one per
    bend in a group's geodesic), then the short-range dilation loop runs to
    the provable fixpoint (usually a single verification pass).

    Sweeps are pure accelerators: they are monotone toward the same fixpoint,
    so exactness comes from the trailing while-loop regardless of
    ``num_sweeps``.  12 sweeps covers the bend counts seen at steady state
    on 19x19 (measured); adversarial shapes just fall through to dilations.
    """
    from gymgo_tpu.core.flood import flood_min_max_two_colors_unrolled

    n = seed_min.shape[-1]
    if num_sweeps is None:
        # bends scale with board size; 12 measured optimal at N=19
        num_sweeps = max(2, min(12, (2 * n) // 3))
    shape = seed_min.shape
    lead = shape[:-2]
    mn = seed_min.astype(jnp.int16).reshape(*lead, n * n)
    mx = seed_max.astype(jnp.int16).reshape(*lead, n * n)
    a = color_a.reshape(*lead, n * n)
    b = color_b.reshape(*lead, n * n)
    big_v = jnp.int16(big)
    small_v = jnp.int16(-1)
    fbool = jnp.zeros((), jnp.bool_)

    def compat(roll, invalid):
        sa = _shift_flat(a, roll, invalid, fbool)
        sb = _shift_flat(b, roll, invalid, fbool)
        return (a & sa) | (b & sb)

    dirs, conns = _build_conns(compat, n)
    for _ in range(num_sweeps):
        mn = _sweep(mn, dirs, conns, jnp.minimum, big_v)
        mx = _sweep(mx, dirs, conns, jnp.maximum, small_v)

    return flood_min_max_two_colors_unrolled(
        mn.reshape(shape), mx.reshape(shape), color_a, color_b, big,
        unroll=unroll,
    )
