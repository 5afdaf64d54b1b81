"""Fixed-point flood-fill primitives — the TPU-native replacement for labeling.

The reference engine leans on ``scipy.ndimage.label`` + per-group Python loops
(/root/reference/gym_go/state_utils.py:48-78, :159-180 and gogame.py:275-300).
Group identity is never actually needed by the rules of Go: every question the
reference answers with labels ("does this group have a liberty?", "does it have
exactly one?", "which color(s) does this empty region touch?") is a monotone
property that can be propagated to a fixpoint through 4-connected components.

These primitives run the propagation with ``lax.while_loop`` until *exact*
convergence, so results are bit-identical to label-based answers for any
board, with data-dependent (usually small) trip counts instead of a worst-case
N^2 bound.  All operators are shape-static and fuse under ``jit``; boards are
tiny (N<=19) so the whole working set stays in VMEM/registers on TPU.

Conventions: planes are ``(..., N, N)``; the batch dimension(s) lead and are
untouched.  Connectivity is 4-neighbor (cross), matching the reference's
``surround_struct`` (/root/reference/gym_go/state_utils.py:17-19).
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "shift",
    "neighbor_or",
    "neighbor_min",
    "neighbor_max",
    "neighbor_count_edge1",
    "flood_or",
    "flood_min_max_two_colors",
    "flood_or_best",
    "flood_min_max_two_colors_best",
]


def shift(x: jax.Array, dr: int, dc: int, fill) -> jax.Array:
    """Shift the last two dims of ``x`` by (dr, dc), filling vacated cells.

    out[..., i, j] = x[..., i - dr, j - dc] where in-bounds, else ``fill``.
    """
    ndim = x.ndim
    pad = [(0, 0)] * (ndim - 2) + [
        (max(dr, 0), max(-dr, 0)),
        (max(dc, 0), max(-dc, 0)),
    ]
    xp = jnp.pad(x, pad, constant_values=fill)
    n_r = x.shape[-2]
    n_c = x.shape[-1]
    r0 = max(-dr, 0)
    c0 = max(-dc, 0)
    sl = (slice(None),) * (ndim - 2) + (slice(r0, r0 + n_r), slice(c0, c0 + n_c))
    return xp[sl]


def neighbor_or(x: jax.Array) -> jax.Array:
    """Bitwise/logical OR over the 4 in-bounds neighbors of each cell.

    Works elementwise on bool or on integer bit-masks (so several independent
    flood bits can share one uint8 plane).
    """
    zero = jnp.zeros((), dtype=x.dtype)
    return (
        shift(x, 1, 0, zero)
        | shift(x, -1, 0, zero)
        | shift(x, 0, 1, zero)
        | shift(x, 0, -1, zero)
    )


def neighbor_min(x: jax.Array, big) -> jax.Array:
    """Min over the 4 in-bounds neighbors; out-of-bounds contributes ``big``."""
    return jnp.minimum(
        jnp.minimum(shift(x, 1, 0, big), shift(x, -1, 0, big)),
        jnp.minimum(shift(x, 0, 1, big), shift(x, 0, -1, big)),
    )


def neighbor_max(x: jax.Array, small) -> jax.Array:
    """Max over the 4 in-bounds neighbors; out-of-bounds contributes ``small``."""
    return jnp.maximum(
        jnp.maximum(shift(x, 1, 0, small), shift(x, -1, 0, small)),
        jnp.maximum(shift(x, 0, 1, small), shift(x, 0, -1, small)),
    )


def neighbor_count_edge1(x: jax.Array) -> jax.Array:
    """Count of 4-neighbors that are set, counting out-of-bounds as set.

    Mirrors the reference's edge-as-wall convolution
    ``ndimage.convolve(all_pieces, surround_struct, mode='constant', cval=1)``
    (/root/reference/gym_go/state_utils.py:77): a cell with value 4 is fully
    surrounded by stones and/or board edges.
    """
    x8 = x.astype(jnp.int8)
    one = jnp.ones((), dtype=jnp.int8)
    return (
        shift(x8, 1, 0, one)
        + shift(x8, -1, 0, one)
        + shift(x8, 0, 1, one)
        + shift(x8, 0, -1, one)
    )


def flood_or(seed: jax.Array, mask: jax.Array) -> jax.Array:
    """OR-propagate ``seed`` through 4-connected components of ``mask``.

    Returns the fixpoint f = mask & (seed | dilate(f)): a cell is set iff it is
    in ``mask`` and its component contains a seeded cell.  ``seed``/``mask``
    may be bool planes or integer bit-mask planes (per-bit independent floods);
    for integers, ``mask`` cells gate all bits.

    Exactness: the operator is monotone on a finite lattice; the while loop
    exits only when an iteration changes nothing, i.e. at the true fixpoint.
    """
    if seed.dtype == jnp.bool_:
        x0 = seed & mask
        gate = mask
    else:
        gate = jnp.where(mask, ~jnp.zeros((), seed.dtype), jnp.zeros((), seed.dtype))
        x0 = seed & gate

    def cond(carry):
        _, changed = carry
        return changed

    def body(carry):
        x, _ = carry
        nx = gate & (x | neighbor_or(x))
        return nx, jnp.any(nx != x)

    out, _ = lax.while_loop(cond, body, (x0, jnp.array(True)))
    return out


def flood_min_max_two_colors(
    seed_min: jax.Array,
    seed_max: jax.Array,
    color_a: jax.Array,
    color_b: jax.Array,
    big: int,
):
    """Propagate per-stone (min, max) values within same-color components.

    ``color_a``/``color_b`` are disjoint bool stone planes.  Propagation is
    allowed only between 4-adjacent cells of the *same* color, so one loop
    resolves both colors at once.  Cells outside both colors keep their seeds.

    The Go use: seed each stone with the min/max flat index of its adjacent
    empty cells (``big`` / -1 when none).  At fixpoint, a stone's (mn, mx) are
    the min/max flat index over its whole group's distinct liberty cells:
      * mn == big          -> group has no liberty
      * mn == mx  < big    -> group has exactly one liberty (at index mn)
      * mn <  mx           -> group has >= 2 liberties
    which reproduces exactly the reference's per-group liberty-count
    classification (own_liberty_counts == 1 / > 1 at
    /root/reference/gym_go/state_utils.py:64-74) without materializing groups.
    """
    big_v = jnp.array(big, seed_min.dtype)
    small_v = jnp.array(-1, seed_max.dtype)

    def one_color(mn, mx, color):
        nmn = neighbor_min(jnp.where(color, mn, big_v), big_v)
        nmx = neighbor_max(jnp.where(color, mx, small_v), small_v)
        mn2 = jnp.where(color, jnp.minimum(mn, nmn), mn)
        mx2 = jnp.where(color, jnp.maximum(mx, nmx), mx)
        return mn2, mx2

    def cond(carry):
        _, _, changed = carry
        return changed

    def body(carry):
        mn, mx, _ = carry
        mn2, mx2 = one_color(mn, mx, color_a)
        mn2, mx2 = one_color(mn2, mx2, color_b)
        changed = jnp.any((mn2 != mn) | (mx2 != mx))
        return mn2, mx2, changed

    mn, mx, _ = lax.while_loop(cond, body, (seed_min, seed_max, jnp.array(True)))
    return mn, mx



def flood_or_unrolled(seed: jax.Array, mask: jax.Array, unroll: int = 4) -> jax.Array:
    """Same fixpoint as ``flood_or`` with ``unroll`` dilation substeps per
    while iteration.  The flood is HBM-bandwidth-bound: fusing U substeps
    into one loop body keeps intermediates on-chip and cuts traffic ~U-fold.
    Extra substeps past the fixpoint are no-ops (monotone + idempotent), so
    exactness is unaffected."""
    if seed.dtype == jnp.bool_:
        x0 = seed & mask
        gate = mask
    else:
        gate = jnp.where(mask, ~jnp.zeros((), seed.dtype), jnp.zeros((), seed.dtype))
        x0 = seed & gate

    def cond(carry):
        return carry[1]

    def body(carry):
        x, _ = carry
        nx = x
        for _ in range(unroll):
            nx = gate & (nx | neighbor_or(nx))
        return nx, jnp.any(nx != x)

    out, _ = lax.while_loop(cond, body, (x0, jnp.array(True)))
    return out


def flood_min_max_two_colors_unrolled(
    seed_min: jax.Array,
    seed_max: jax.Array,
    color_a: jax.Array,
    color_b: jax.Array,
    big: int,
    unroll: int = int(_os.environ.get("GYMGO_UNROLL", "4")),
):
    """Same fixpoint as ``flood_min_max_two_colors``, optimized:

    * int16 values (indices fit for any N <= 181);
    * per-direction same-color masks hoisted out of the loop — a cell
      receives from its neighbor in direction d iff both are stones of one
      color, so one precomputed mask per direction serves both colors and
      halves the per-iteration shift count (8 instead of 16);
    * ``unroll`` fused substeps per while iteration (the loop is
      bandwidth-bound; fused substeps keep intermediates on-chip).
    Extra substeps past the fixpoint are no-ops, so exactness holds.
    """
    in_dtype = seed_min.dtype
    mn0 = seed_min.astype(jnp.int16)
    mx0 = seed_max.astype(jnp.int16)
    big_v = jnp.int16(big)
    small_v = jnp.int16(-1)
    f = jnp.zeros((), jnp.bool_)

    dirs = ((1, 0), (-1, 0), (0, 1), (0, -1))
    same = tuple(
        (color_a & shift(color_a, dr, dc, f)) | (color_b & shift(color_b, dr, dc, f))
        for (dr, dc) in dirs
    )

    def substep(mn, mx):
        nmn, nmx = mn, mx
        for (dr, dc), same_d in zip(dirs, same):
            # Gauss-Seidel style: later directions see earlier updates
            # within the substep (faster convergence, same fixpoint).
            nmn = jnp.minimum(nmn, jnp.where(same_d, shift(nmn, dr, dc, big_v), big_v))
            nmx = jnp.maximum(nmx, jnp.where(same_d, shift(nmx, dr, dc, small_v), small_v))
        return nmn, nmx

    def cond(carry):
        return carry[2]

    def body(carry):
        mn, mx, _ = carry
        nmn, nmx = mn, mx
        for _ in range(unroll):
            nmn, nmx = substep(nmn, nmx)
        return nmn, nmx, jnp.any((nmn != mn) | (nmx != mx))

    mn, mx, _ = lax.while_loop(cond, body, (mn0, mx0, jnp.array(True)))
    return mn.astype(in_dtype), mx.astype(in_dtype)



def flood_min_max_two_colors_split(
    seed_min: jax.Array,
    seed_max: jax.Array,
    color_a: jax.Array,
    color_b: jax.Array,
    big: int,
    unroll: int = 4,
):
    """Bandwidth-split variant: an int16 min-index flood, then an int8
    OR-flood of "group has a liberty other than its min" — together they
    reproduce (mn, mx)-classification semantics with ~25% less loop traffic
    (4 int16 + 4 int8 shifts/substep instead of 8 int16).

    The returned ``mx`` is synthetic: big-1 when a second distinct liberty
    exists, else equal to mn — callers only ever compare mn==mx / mn<mx
    (see step.py), which this preserves exactly.
    """
    in_dtype = seed_min.dtype
    mn0 = seed_min.astype(jnp.int16)
    big_v = jnp.int16(big)
    f = jnp.zeros((), jnp.bool_)

    dirs = ((1, 0), (-1, 0), (0, 1), (0, -1))
    same = tuple(
        (color_a & shift(color_a, dr, dc, f)) | (color_b & shift(color_b, dr, dc, f))
        for (dr, dc) in dirs
    )

    def min_substep(mn, order):
        for (dr, dc), same_d in order:
            mn = jnp.minimum(mn, jnp.where(same_d, shift(mn, dr, dc, big_v), big_v))
        return mn

    fwd = tuple(zip(dirs, same))
    rev = tuple(reversed(fwd))

    def min_body(carry):
        mn, _ = carry
        nmn = mn
        for u in range(unroll):
            # Alternating direction order speeds Gauss-Seidel propagation
            # along zigzag group shapes (same fixpoint either way).
            nmn = min_substep(nmn, fwd if u % 2 == 0 else rev)
        return nmn, jnp.any(nmn != mn)

    mn, _ = lax.while_loop(lambda c: c[1], min_body, (mn0, jnp.array(True)))

    # Second pass: does the group touch an empty cell whose index differs
    # from the group min?  seed_max's -1/index encoding tells us each
    # stone's adjacent empty cells only via neighbor scan; recompute the
    # seed directly from the color planes.
    stones = color_a | color_b
    empty = ~stones
    n = seed_min.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int16, seed_min.shape, seed_min.ndim - 2)
    cols = jax.lax.broadcasted_iota(jnp.int16, seed_min.shape, seed_min.ndim - 1)
    cell_idx = rows * jnp.int16(n) + cols
    e_idx = jnp.where(empty, cell_idx, jnp.int16(-1))
    other = jnp.zeros(seed_min.shape, jnp.bool_)
    for (dr, dc) in dirs:
        nbr = shift(e_idx, dr, dc, jnp.int16(-1))
        other = other | ((nbr >= 0) & (nbr != mn))
    other = other & stones

    def or_substep(x):
        for (dr, dc), same_d in zip(dirs, same):
            x = x | (jnp.where(same_d, shift(x, dr, dc, f), f))
        return x

    def or_body(carry):
        x, _ = carry
        nx = x
        for _ in range(unroll):
            nx = or_substep(nx)
        return nx, jnp.any(nx != x)

    other, _ = lax.while_loop(lambda c: c[1], or_body, (other, jnp.array(True)))

    mx = jnp.where(other, jnp.int16(big - 1), mn)
    # Preserve mn<mx even when mn == big-1 and a second liberty exists:
    # impossible (mn is the MINIMUM of >=2 distinct indices <= big-1, so
    # mn <= big-2 there); assert statically via construction.
    return mn.astype(in_dtype), mx.astype(in_dtype)


def liberty_classes_from_minmax(color_a, color_b, n, minmax_fn):
    """(one_lib, multi_lib) stone maps derived from a (min, max) flood
    implementation — the seed construction shared by all minmax variants."""
    big = n * n
    stones = color_a | color_b
    empty = ~stones
    rows = jax.lax.broadcasted_iota(jnp.int32, color_a.shape, color_a.ndim - 2)
    cols = jax.lax.broadcasted_iota(jnp.int32, color_a.shape, color_a.ndim - 1)
    cell_idx = rows * n + cols
    empty_idx = jnp.where(empty, cell_idx, big)
    empty_idx_neg = jnp.where(empty, cell_idx, jnp.int32(-1))
    seed_min = neighbor_min(empty_idx, big)
    seed_max = neighbor_max(empty_idx_neg, -1)
    mn, mx = minmax_fn(seed_min, seed_max, color_a, color_b, big)
    has_lib = mn < big
    one_lib = stones & has_lib & (mn == mx)
    multi_lib = stones & (mn < mx)
    # atari encoding: sole-liberty flat index + 1 for stones whose group has
    # exactly one distinct liberty; 0 elsewhere (so zero-filled resets are
    # self-consistent).  Consumed by the carried-capture fast path (step.py).
    atari_enc = jnp.where(one_lib, (mn + 1).astype(jnp.int16), jnp.int16(0))
    return one_lib, multi_lib, atari_enc


# --------------------------------------------------------------------------
# dispatch: all three implementations compute identical fixpoints
# (tests/test_flood_equivalence.py).  "unrolled" (default) is fastest on TPU
# at production batch sizes; "sweep" = long-range segmented sweeps;
# "simple" = the short-range reference implementation, for cross-checking.
# --------------------------------------------------------------------------

_IMPL = _os.environ.get("GYMGO_FLOOD", "bitpack")
# substeps fused per while iteration of the bitpack flood (alternating
# fwd/rev direction order); extra substeps past the fixpoint are no-ops
_BITPACK_UNROLL = int(_os.environ.get("GYMGO_BITPACK_UNROLL", "4"))
# unchecked substep prefix before the convergence-checked while loop: the
# operator is monotone+idempotent, so extra/early substeps never change the
# fixpoint, but each while iteration pays a batch-wide reduction + scalar
# sync — a prefix near the typical trip count skips most of those checks.
_BITPACK_PREFIX = int(_os.environ.get("GYMGO_BITPACK_PREFIX", "16"))
# benchmark-only ablation: run EXACTLY the prefix substeps and skip the
# convergence loop (unsound results; used to decompose step cost)
_BITPACK_FIXED_ONLY = _os.environ.get("GYMGO_BITPACK_FIXED_ONLY") == "1"
# gatepack jump distances, e.g. "12" -> (1, 2); ascending powers of two
_GATEPACK_JUMPS = tuple(int(c) for c in _os.environ.get("GYMGO_JUMPS", "12"))

if _IMPL == "simple":
    flood_or_best = flood_or
    flood_min_max_two_colors_best = flood_min_max_two_colors
elif _IMPL == "sweep":
    from gymgo_tpu.core.flood_fast import (
        flood_or_fast as flood_or_best,
        flood_min_max_two_colors_fast as flood_min_max_two_colors_best,
    )
elif _IMPL == "unrolled":
    flood_or_best = flood_or_unrolled
    flood_min_max_two_colors_best = flood_min_max_two_colors_unrolled
elif _IMPL == "split":
    flood_or_best = flood_or_unrolled
    flood_min_max_two_colors_best = flood_min_max_two_colors_split
elif _IMPL in ("bitpack", "gatepack", "pallas"):
    flood_or_best = flood_or_unrolled
    flood_min_max_two_colors_best = flood_min_max_two_colors_unrolled
else:  # hybrid (default): sweeps + exact dilation verify for minmax
    from gymgo_tpu.core.flood_fast import (
        flood_min_max_two_colors_hybrid as flood_min_max_two_colors_best,
    )
    flood_or_best = flood_or_unrolled


def flood_bundle_bitpack(color_a: jax.Array, color_b: jax.Array, n: int):
    """liberty_classes_bitpack + Trump-Taylor claim bits in the same flood.

    Empty-region claim propagation is disjoint from stone propagation (a
    cell pair is compatible iff same-region: a-a, b-b, or empty-empty), so
    two extra word bits carry "region touches color_a / color_b" through the
    very same packed OR-flood:

      bits 0-8   OR of liberty codes (stones)
      bits 9-17  OR of complemented liberty codes (stones)
      bit 18     region touches color_a (empties)
      bit 19     region touches color_b (empties)

    Returns (one_lib, multi_lib, only_a, only_b, atari_enc): stone liberty
    classes, the empty cells claimed exclusively by each color
    (gogame.py:275-300), and the per-stone atari encoding (sole-liberty flat
    index + 1 when the group has exactly one distinct liberty, else 0).
    """
    mask9 = jnp.int32((1 << 9) - 1)
    bit_a = jnp.int32(1 << 18)
    bit_b = jnp.int32(1 << 19)
    stones = color_a | color_b
    empty = ~stones
    rows = jax.lax.broadcasted_iota(jnp.int32, color_a.shape, color_a.ndim - 2)
    cols = jax.lax.broadcasted_iota(jnp.int32, color_a.shape, color_a.ndim - 1)
    v = jnp.where(empty, rows * n + cols + 1, 0)
    inv_v = jnp.where(empty, (~(rows * n + cols + 1)) & mask9, 0)
    packed_cell = v | (inv_v << 9)

    zero = jnp.int32(0)
    z8 = jnp.uint8(0)
    dirs = ((1, 0), (-1, 0), (0, 1), (0, -1))
    # One packed uint8 class plane (bit0 a, bit1 b, bit2 empty) serves seed
    # touches AND the per-direction gates: one uint8 shift per direction
    # replaces three bool shifts (each cell holds exactly one class bit, so
    # "same class" == nonzero AND of the packed planes).
    cls8 = (
        jnp.where(color_a, jnp.uint8(1), z8)
        | jnp.where(color_b, jnp.uint8(2), z8)
        | jnp.where(empty, jnp.uint8(4), z8)
    )
    lib_seed = zero
    touch8 = z8
    same = []
    for (dr, dc) in dirs:
        lib_seed = lib_seed | shift(packed_cell, dr, dc, zero)
        s8 = shift(cls8, dr, dc, z8)
        touch8 = touch8 | s8
        same.append((cls8 & s8) != 0)
    same = tuple(same)
    seed = jnp.where(stones, lib_seed, zero)
    seed = seed | jnp.where(empty & ((touch8 & jnp.uint8(1)) != 0), bit_a, zero)
    seed = seed | jnp.where(empty & ((touch8 & jnp.uint8(2)) != 0), bit_b, zero)

    def substep(x, order):
        for (dr, dc), same_d in order:
            x = x | jnp.where(same_d, shift(x, dr, dc, zero), zero)
        return x

    fwd = tuple(zip(dirs, same))
    rev = tuple(reversed(fwd))

    def body(carry):
        x, _ = carry
        nx = x
        for u in range(_BITPACK_UNROLL):
            nx = substep(nx, fwd if u % 2 == 0 else rev)
        return nx, jnp.any(nx != x)

    if _BITPACK_PREFIX:
        def prefix_body(k, x):
            x = substep(x, fwd)
            return substep(x, rev)
        seed = lax.fori_loop(0, _BITPACK_PREFIX // 2, prefix_body, seed)
    if _BITPACK_FIXED_ONLY:
        packed = seed
    else:
        packed, _ = lax.while_loop(lambda c: c[1], body, (seed, jnp.array(True)))

    or_bits = packed & mask9
    and_bits = (~(packed >> 9)) & mask9
    has_lib = or_bits != 0
    one_lib = stones & has_lib & (or_bits == and_bits)
    multi_lib = stones & has_lib & (or_bits != and_bits)
    got_a = (packed & bit_a) != 0
    got_b = (packed & bit_b) != 0
    only_a = empty & got_a & ~got_b
    only_b = empty & got_b & ~got_a
    # or_bits for a one-liberty group IS its sole liberty's code (idx + 1),
    # so the atari encoding falls out of the flood for free.
    atari_enc = jnp.where(one_lib, or_bits.astype(jnp.int16), jnp.int16(0))
    return one_lib, multi_lib, only_a, only_b, atari_enc


def flood_bundle_gatepack(
    color_a: jax.Array,
    color_b: jax.Array,
    n: int,
    jumps: tuple[int, ...] | None = None,
    unroll: int | None = None,
):
    """``flood_bundle_bitpack`` with two HBM-traffic optimizations.

    The bitpack flood loop is HBM-bound: each substep re-reads the int32
    word (r+w) plus four separate 1-byte direction gates.  Here:

      1. All gates ride ONE packed uint8/uint16 plane — the four direction
         reads of a substep hit the same array at the same index, so the
         fused loop body loads it once (4x less gate traffic).
      2. Optional power-of-two JUMP gates: bit (j*4 + k) says "this cell can
         receive from its neighbor at distance jumps[j] in direction k
         through an unbroken same-class run" (class = black/white/empty;
         distance-2s gates are built by doubling distance-s gates).  A
         substep then moves information up to sum(jumps) cells per
         direction for one word round-trip, cutting the loop trip count
         ~len(jumps)-fold at steady state.

    Exactness: every gated jump propagates strictly within same-class runs
    (sound: the run is inside the 4-connected component), jump distance 1 is
    always present (complete), and the while_loop exits only at the true
    fixpoint — so the result is bit-identical to ``flood_bundle_bitpack``
    (enforced by tests/test_flood_equivalence.py::test_bundle_variants_agree
    and the reference-parity suite).
    """
    if jumps is None:
        jumps = _GATEPACK_JUMPS
    if unroll is None:
        unroll = _BITPACK_UNROLL
    mask9 = jnp.int32((1 << 9) - 1)
    bit_a = jnp.int32(1 << 18)
    bit_b = jnp.int32(1 << 19)
    stones = color_a | color_b
    empty = ~stones
    rows = jax.lax.broadcasted_iota(jnp.int32, color_a.shape, color_a.ndim - 2)
    cols = jax.lax.broadcasted_iota(jnp.int32, color_a.shape, color_a.ndim - 1)
    v = jnp.where(empty, rows * n + cols + 1, 0)
    inv_v = jnp.where(empty, (~(rows * n + cols + 1)) & mask9, 0)
    packed_cell = v | (inv_v << 9)

    zero = jnp.int32(0)
    f = jnp.zeros((), jnp.bool_)
    dirs = ((1, 0), (-1, 0), (0, 1), (0, -1))
    lib_seed = zero
    touch_a = jnp.zeros(color_a.shape, jnp.bool_)
    touch_b = jnp.zeros(color_a.shape, jnp.bool_)
    for (dr, dc) in dirs:
        lib_seed = lib_seed | shift(packed_cell, dr, dc, zero)
        touch_a = touch_a | shift(color_a, dr, dc, f)
        touch_b = touch_b | shift(color_b, dr, dc, f)
    seed = jnp.where(stones, lib_seed, zero)
    seed = seed | jnp.where(empty & touch_a, bit_a, zero)
    seed = seed | jnp.where(empty & touch_b, bit_b, zero)

    nbits = 4 * len(jumps)
    gdtype = jnp.uint8 if nbits <= 8 else jnp.uint16
    gates = jnp.zeros(color_a.shape, gdtype)
    plan = []  # per direction: ((roll_dr, roll_dc, bit_mask), ...) largest jump first
    for k, (dr, dc) in enumerate(dirs):
        g = (
            (color_a & shift(color_a, dr, dc, f))
            | (color_b & shift(color_b, dr, dc, f))
            | (empty & shift(empty, dr, dc, f))
        )
        dist = 1
        per_dir = []
        for j, s in enumerate(jumps):
            while dist < s:  # double: run of 2d = run of d + shifted run of d
                g = g & shift(g, dist * dr, dist * dc, f)
                dist *= 2
            if dist != s:
                raise ValueError("jumps must be ascending powers of two")
            bit = j * 4 + k
            gates = gates | jnp.where(g, gdtype(1 << bit), gdtype(0))
            per_dir.append((s * dr, s * dc, gdtype(1 << bit)))
        plan.append(tuple(reversed(per_dir)))

    gzero = gdtype(0)

    def substep(x, order):
        for per_dir in order:
            for (rdr, rdc, bit) in per_dir:
                m = (gates & bit) != gzero
                x = x | jnp.where(m, shift(x, rdr, rdc, zero), zero)
        return x

    fwd = tuple(plan)
    rev = tuple(reversed(plan))

    def body(carry):
        x, _ = carry
        nx = x
        for u in range(unroll):
            nx = substep(nx, fwd if u % 2 == 0 else rev)
        return nx, jnp.any(nx != x)

    packed, _ = lax.while_loop(lambda c: c[1], body, (seed, jnp.array(True)))

    or_bits = packed & mask9
    and_bits = (~(packed >> 9)) & mask9
    has_lib = or_bits != 0
    one_lib = stones & has_lib & (or_bits == and_bits)
    multi_lib = stones & has_lib & (or_bits != and_bits)
    got_a = (packed & bit_a) != 0
    got_b = (packed & bit_b) != 0
    only_a = empty & got_a & ~got_b
    only_b = empty & got_b & ~got_a
    atari_enc = jnp.where(one_lib, or_bits.astype(jnp.int16), jnp.int16(0))
    return one_lib, multi_lib, only_a, only_b, atari_enc


def liberty_classes_bitpack(color_a: jax.Array, color_b: jax.Array, n: int):
    """(one_lib, multi_lib) bool maps per stone via ONE packed OR-flood.

    Encoding: each liberty cell contributes v = flat_index + 1 (9 bits,
    v in [1, n*n]).  Per group we need OR(v) and AND(v) over its distinct
    liberty cells: all-equal  <=>  OR == AND  <=>  exactly one distinct
    liberty.  AND is propagated as OR of the complement (De Morgan), so the
    whole thing packs into one int32 word per cell:

        packed = OR_bits  |  (~AND_bits & MASK) << 9

    and bitwise OR distributes over both fields — a single pure-OR flood
    within same-color components (gated by precomputed per-direction
    same-color masks; OR's neutral 0 makes gating a cheap AND).  Stones with
    no adjacent empty contribute (0, 0): neutral for both fields.

      has_lib  = OR_bits != 0
      one_lib  = has_lib and OR_bits == AND_bits
      multi    = has_lib and OR_bits != AND_bits
    """
    mask9 = jnp.int32((1 << 9) - 1)
    stones = color_a | color_b
    empty = ~stones
    rows = jax.lax.broadcasted_iota(jnp.int32, color_a.shape, color_a.ndim - 2)
    cols = jax.lax.broadcasted_iota(jnp.int32, color_a.shape, color_a.ndim - 1)
    v = jnp.where(empty, rows * n + cols + 1, 0)
    inv_v = jnp.where(empty, (~(rows * n + cols + 1)) & mask9, 0)
    packed_cell = v | (inv_v << 9)

    zero = jnp.int32(0)
    dirs = ((1, 0), (-1, 0), (0, 1), (0, -1))
    # per-stone seed: OR over adjacent empty cells' packed words
    seed = zero
    for (dr, dc) in dirs:
        seed = seed | shift(packed_cell, dr, dc, zero)
    seed = jnp.where(stones, seed, zero)

    f = jnp.zeros((), jnp.bool_)
    same = tuple(
        (color_a & shift(color_a, dr, dc, f))
        | (color_b & shift(color_b, dr, dc, f))
        for (dr, dc) in dirs
    )

    def substep(x, order):
        for (dr, dc), same_d in order:
            x = x | jnp.where(same_d, shift(x, dr, dc, zero), zero)
        return x

    fwd = tuple(zip(dirs, same))
    rev = tuple(reversed(fwd))

    def body(carry):
        x, _ = carry
        nx = x
        for u in range(_BITPACK_UNROLL):
            nx = substep(nx, fwd if u % 2 == 0 else rev)
        return nx, jnp.any(nx != x)

    packed, _ = lax.while_loop(lambda c: c[1], body, (seed, jnp.array(True)))

    or_bits = packed & mask9
    and_bits = (~(packed >> 9)) & mask9
    has_lib = or_bits != 0
    one_lib = stones & has_lib & (or_bits == and_bits)
    multi_lib = stones & has_lib & (or_bits != and_bits)
    atari_enc = jnp.where(one_lib, or_bits.astype(jnp.int16), jnp.int16(0))
    return one_lib, multi_lib, atari_enc


import functools as _functools

if _IMPL in ("bitpack", "gatepack", "pallas"):
    liberty_classification_best = liberty_classes_bitpack
else:
    liberty_classification_best = _functools.partial(
        liberty_classes_from_minmax, minmax_fn=flood_min_max_two_colors_best
    )


def flood_bundle_from_parts(color_a, color_b, n):
    """Bundle fallback: classification via the dispatched minmax variant plus
    a separate two-bit claim flood (used when GYMGO_FLOOD != bitpack)."""
    one_lib, multi_lib, atari_enc = liberty_classification_best(color_a, color_b, n)
    empty = ~(color_a | color_b)
    touch = jnp.where(empty & neighbor_or(color_a), jnp.uint8(1), jnp.uint8(0))
    touch = touch | jnp.where(empty & neighbor_or(color_b), jnp.uint8(2), jnp.uint8(0))
    touch = flood_or_best(touch, empty)
    only_a = empty & (touch == 1)
    only_b = empty & (touch == 2)
    return one_lib, multi_lib, only_a, only_b, atari_enc


def flood_bundle_pallas(color_a: jax.Array, color_b: jax.Array, n: int):
    """``flood_bundle_bitpack`` computed by the per-block-convergent Pallas
    kernel (ops/pallas_flood.py): a grid over small env blocks, each running
    the same packed OR-flood to its OWN fixpoint in VMEM instead of the
    batch-max trip count — ~2x less substep work at 19x19 B=4096 steady
    state (see BENCHMARKS.md).  Bit-identical outputs: the kernel converges
    the identical monotone operator, and the unpacking below is the same
    algebra as flood_bundle_bitpack's."""
    from gymgo_tpu.ops.pallas_flood import bundle_flood_pallas

    tile = int(_os.environ.get("GYMGO_PALLAS_TILE", "16"))
    interpret = jax.default_backend() != "tpu"
    packed = bundle_flood_pallas(color_a, color_b, tile=tile, interpret=interpret)
    mask9 = jnp.int32((1 << 9) - 1)
    bit_a = jnp.int32(1 << 18)
    bit_b = jnp.int32(1 << 19)
    stones = color_a | color_b
    empty = ~stones
    or_bits = packed & mask9
    and_bits = (~(packed >> 9)) & mask9
    has_lib = or_bits != 0
    one_lib = stones & has_lib & (or_bits == and_bits)
    multi_lib = stones & has_lib & (or_bits != and_bits)
    got_a = (packed & bit_a) != 0
    got_b = (packed & bit_b) != 0
    only_a = empty & got_a & ~got_b
    only_b = empty & got_b & ~got_a
    atari_enc = jnp.where(one_lib, or_bits.astype(jnp.int16), jnp.int16(0))
    return one_lib, multi_lib, only_a, only_b, atari_enc


if _IMPL == "gatepack":
    flood_bundle_best = flood_bundle_gatepack
elif _IMPL == "bitpack":
    flood_bundle_best = flood_bundle_bitpack
elif _IMPL == "pallas":
    flood_bundle_best = flood_bundle_pallas
else:
    flood_bundle_best = flood_bundle_from_parts
