"""Pallas TPU kernel: VMEM-resident group-liberty (min, max) flood.

The XLA while-loop flood (flood.flood_min_max_two_colors_unrolled) round-trips
its carries through HBM every iteration and synchronizes convergence over the
whole batch.  This kernel tiles the env batch over a grid; each tile holds
its boards entirely in VMEM, runs the propagation to its *own* fixpoint
(per-tile trip counts instead of batch-max), and writes the converged
(min, max) liberty indices once.  Boards are processed flattened to
(TILE, N*N) so the long dim sits on vector lanes; row/col neighbor shifts
are lane-rolls plus boundary masks.

Semantics are identical to flood.flood_min_max_two_colors (the seeds are
computed in-kernel from the two color planes): for each stone, the min/max
flat index over its group's distinct adjacent-empty cells; non-stone cells
return their seed values (unused downstream).  Exactness is checked against
the XLA implementation in tests (interpret mode) and on real TPU by
scripts/check_pallas_tpu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["minmax_liberty_flood_pallas", "bundle_flood_pallas"]


def _kernel(mover_ref, opp_ref, mn_ref, mx_ref, *, n: int):
    # All values int32: Mosaic's lane-rotate only supports 32-bit data.
    m = n * n
    big = jnp.int32(m)
    small = jnp.int32(-1)

    mover = mover_ref[:].astype(jnp.int32)  # 0/1
    opp = opp_ref[:].astype(jnp.int32)
    empty1 = 1 - mover - opp  # 0/1

    tile = mover.shape[0]
    flat = jax.lax.broadcasted_iota(jnp.int32, (tile, m), 1)
    col = flat % n

    # (roll, boundary_ok) per direction; out[j] receives from j - roll.
    dirs = (
        (n, None),        # from row above (j-n); valid iff j >= n
        (-n, None),       # from row below
        (1, col > 0),     # from left neighbor, not across row edge
        (-1, col < n - 1),
    )

    def rolled(x, roll, ok, fill):
        y = pltpu.roll(x, roll % m, axis=1)  # circular; negative == m - |roll|
        row_ok = (flat >= roll) if roll > 0 else (flat < m + roll)
        valid = row_ok if ok is None else (row_ok & ok)
        return jnp.where(valid, y, fill)

    zero = jnp.int32(0)
    same = tuple(
        ((mover & rolled(mover, roll, ok, zero))
         | (opp & rolled(opp, roll, ok, zero))) != 0
        for (roll, ok) in dirs
    )

    empty_idx = jnp.where(empty1 != 0, flat, big)
    empty_idx_neg = jnp.where(empty1 != 0, flat, small)
    seed_mn = jnp.full((tile, m), big, jnp.int32)
    seed_mx = jnp.full((tile, m), small, jnp.int32)
    for (roll, ok) in dirs:
        seed_mn = jnp.minimum(seed_mn, rolled(empty_idx, roll, ok, big))
        seed_mx = jnp.maximum(seed_mx, rolled(empty_idx_neg, roll, ok, small))

    # Pack (mn, inverted mx) into one int32 word so each direction costs a
    # single lane-rotate: low 16 bits hold mn, high 16 hold (BIG - mx).
    # min/max distribute over the fields after unpacking; the boundary
    # masking on value rotates is unnecessary because ``same`` masks are
    # already False across row/board edges.
    def pack(mn, mx):
        return ((big - mx) << 16) | mn

    def unpack(p):
        return p & 0xFFFF, big - (p >> 16)

    def substep(p):
        mn, mx = unpack(p)
        for (roll, ok), same_d in zip(dirs, same):
            q = pltpu.roll(pack(mn, mx), roll % m, axis=1)
            qmn, qmx = unpack(q)
            mn = jnp.minimum(mn, jnp.where(same_d, qmn, big))
            mx = jnp.maximum(mx, jnp.where(same_d, qmx, small))
        return pack(mn, mx)

    def cond(c):
        return c[1]

    def body(c):
        p, _ = c
        np_ = p
        for _ in range(4):
            np_ = substep(np_)
        return np_, jnp.any(np_ != p)

    packed, _ = lax.while_loop(
        cond, body, (pack(seed_mn, seed_mx), jnp.array(True))
    )
    mn, mx = unpack(packed)
    mn_ref[:] = mn.astype(jnp.int16)
    mx_ref[:] = mx.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def minmax_liberty_flood_pallas(
    mover: jax.Array, opp: jax.Array, tile: int = 256, interpret: bool = False
):
    """(mn, mx) int16 (B, N, N): per-stone group min/max distinct-liberty
    indices, BIG = N*N when none.  ``mover``/``opp`` are bool/int8 planes."""
    b, n, _ = mover.shape
    m = n * n
    tile = min(tile, b)
    if b % tile != 0:
        # fall back to one-tile-per-batch grid rounding
        tile = b if b < tile else next(t for t in range(tile, 0, -1) if b % t == 0)
    grid = (b // tile,)
    flat_shape = (b, m)
    mover_f = mover.astype(jnp.int8).reshape(flat_shape)
    opp_f = opp.astype(jnp.int8).reshape(flat_shape)

    out_shape = [
        jax.ShapeDtypeStruct(flat_shape, jnp.int16),
        jax.ShapeDtypeStruct(flat_shape, jnp.int16),
    ]
    block = pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mn, mx = pl.pallas_call(
        functools.partial(_kernel, n=n),
        out_shape=out_shape,
        grid=grid,
        in_specs=[block, block],
        out_specs=[block, block],
        interpret=interpret,
    )(mover_f, opp_f)
    return mn.reshape(b, n, n), mx.reshape(b, n, n)


# ---------------------------------------------------------------------------
# Per-block-convergent bitpack bundle flood
# ---------------------------------------------------------------------------
#
# The production classification flood (flood.flood_bundle_bitpack) runs ONE
# lax.while_loop over the whole batch, so every step pays the BATCH-MAX trip
# count.  Measured at 19x19 B=4096 steady state (scripts/measure_convergence.py):
# batch-max ~36 substeps/step while the per-env mean is ~10; blocks of 8-32
# envs converge in ~19-24 substeps.  SPMD/XLA cannot express per-board early
# exit — a Pallas grid over small env blocks can: each grid step holds its
# boards in VMEM, runs the SAME packed OR-flood to its own fixpoint, and
# writes the converged word once.  Substep op count matches the XLA loop
# (4 x roll+select+or on one int32 word, gates held on-chip), so the ~2x
# trip-count reduction is pure win if per-grid-step overhead stays small.


def _bundle_kernel(mover_ref, opp_ref, out_ref, *, n: int, unroll: int):
    m = n * n
    mask9 = jnp.int32((1 << 9) - 1)
    bit_a = jnp.int32(1 << 18)
    bit_b = jnp.int32(1 << 19)
    zero = jnp.int32(0)

    mover = mover_ref[:]  # int32 0/1 (TILE, m)
    opp = opp_ref[:]
    stones = (mover | opp) != 0
    empty = ~stones

    tile = mover.shape[0]
    flat = jax.lax.broadcasted_iota(jnp.int32, (tile, m), 1)
    col = flat % n

    # out[j] receives from j - roll; same direction order as the XLA
    # bitpack flood: ((1,0),(-1,0),(0,1),(0,-1)) == rolls (n,-n,1,-1).
    dirs = (
        (n, None),
        (-n, None),
        (1, col > 0),
        (-1, col < n - 1),
    )

    def rolled(x, roll, ok, fill):
        y = pltpu.roll(x, roll % m, axis=1)
        row_ok = (flat >= roll) if roll > 0 else (flat < m + roll)
        valid = row_ok if ok is None else (row_ok & ok)
        return jnp.where(valid, y, fill)

    # Liberty-cell codes on empty cells: OR bits (idx+1) and De-Morgan AND
    # bits (~(idx+1) & mask9) share one word — see flood_bundle_bitpack.
    v = jnp.where(empty, flat + 1, 0)
    inv_v = jnp.where(empty, (~(flat + 1)) & mask9, 0)
    packed_cell = v | (inv_v << 9)

    # Mosaic's lane-rotate needs 32-bit data: class planes roll as int32
    # 0/1 and gate booleans come from comparisons afterwards.
    mover_b = mover != 0
    opp_b = opp != 0
    empty_i = 1 - (mover | opp)
    seed = zero
    touch_a = jnp.zeros((tile, m), jnp.bool_)
    touch_b = jnp.zeros((tile, m), jnp.bool_)
    gates = []
    for (roll, ok) in dirs:
        seed = seed | rolled(packed_cell, roll, ok, zero)
        ra = rolled(mover, roll, ok, zero) != 0
        rb = rolled(opp, roll, ok, zero) != 0
        re = rolled(empty_i, roll, ok, zero) != 0
        touch_a = touch_a | ra
        touch_b = touch_b | rb
        gates.append((mover_b & ra) | (opp_b & rb) | (empty & re))
    seed = jnp.where(stones, seed, zero)
    seed = seed | jnp.where(empty & touch_a, bit_a, zero)
    seed = seed | jnp.where(empty & touch_b, bit_b, zero)

    fwd = tuple(zip(dirs, gates))
    rev = tuple(reversed(fwd))

    def substep(x, order):
        for ((roll, _ok), gate) in order:
            # no boundary masking on the value roll: gates are already
            # False across row/board edges
            y = pltpu.roll(x, roll % m, axis=1)
            x = x | jnp.where(gate, y, zero)
        return x

    def body(c):
        x, _ = c
        nx = x
        for u in range(unroll):
            nx = substep(nx, fwd if u % 2 == 0 else rev)
        return nx, jnp.any(nx != x)

    packed, _ = lax.while_loop(lambda c: c[1], body, (seed, jnp.array(True)))
    out_ref[:] = packed


@functools.partial(jax.jit, static_argnames=("tile", "unroll", "interpret"))
def bundle_flood_pallas(
    mover: jax.Array,
    opp: jax.Array,
    tile: int = 16,
    unroll: int = 4,
    interpret: bool = False,
):
    """Converged bitpack bundle word, int32 (B, N, N).

    Bit-identical to the while-loop fixpoint of flood.flood_bundle_bitpack
    (bits 0-8 OR of liberty codes, 9-17 OR of complements, 18/19 region
    claim bits); computed with per-``tile``-envs convergence instead of
    batch-max.  ``mover``/``opp`` are bool/int8 stone planes (B, N, N).
    """
    b, n, _ = mover.shape
    m = n * n
    tile = min(tile, b)
    if b % tile != 0:
        tile = b if b < tile else next(t for t in range(tile, 0, -1) if b % t == 0)
    grid = (b // tile,)
    mover_f = mover.astype(jnp.int32).reshape(b, m)
    opp_f = opp.astype(jnp.int32).reshape(b, m)
    block = pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    packed = pl.pallas_call(
        functools.partial(_bundle_kernel, n=n, unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((b, m), jnp.int32),
        grid=grid,
        in_specs=[block, block],
        out_specs=block,
        interpret=interpret,
    )(mover_f, opp_f)
    return packed.reshape(b, n, n)
