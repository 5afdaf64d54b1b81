"""The segmented-sweep flood (flood_fast) must be bit-identical to the
simple short-range flood on adversarial and random masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymgo_tpu.core import flood, flood_fast


def _serpentine_mask(n):
    """Worst-case run structure: full rows joined by single connectors."""
    m = np.zeros((n, n), bool)
    for r in range(0, n, 2):
        m[r, :] = True
    for r in range(1, n, 2):
        m[r, n - 1 if (r // 2) % 2 == 0 else 0] = True
    return m


def _staircase_mask(n):
    m = np.zeros((n, n), bool)
    r = c = 0
    while r < n and c < n:
        m[r, c] = True
        if (r + c) % 2 == 0:
            c += 1
        else:
            r += 1
    return m


@pytest.mark.parametrize("n", [5, 9, 19])
def test_flood_or_equivalence_random(n):
    rng = np.random.default_rng(0)
    for density in (0.2, 0.5, 0.8):
        mask = jnp.asarray(rng.random((16, n, n)) < density)
        seed = jnp.asarray(rng.random((16, n, n)) < 0.05) & mask
        simple = flood.flood_or(seed, mask)
        fast = flood_fast.flood_or_fast(seed, mask)
        np.testing.assert_array_equal(np.asarray(simple), np.asarray(fast))


@pytest.mark.parametrize("maker", [_serpentine_mask, _staircase_mask])
def test_flood_or_equivalence_adversarial(maker):
    n = 19
    mask = jnp.asarray(maker(n))[None]
    seed = jnp.zeros((1, n, n), bool).at[0, 0, 0].set(True) & mask
    simple = flood.flood_or(seed, mask)
    fast = flood_fast.flood_or_fast(seed, mask)
    np.testing.assert_array_equal(np.asarray(simple), np.asarray(fast))
    # the whole component must be reached
    assert np.asarray(fast).sum() == np.asarray(mask).sum() or not bool(mask[0, 0, 0])


@pytest.mark.parametrize("n", [5, 9, 19])
def test_minmax_flood_equivalence(n):
    rng = np.random.default_rng(1)
    big = n * n
    for _ in range(4):
        occ = rng.random((8, n, n))
        a = jnp.asarray(occ < 0.35)
        b = jnp.asarray((occ >= 0.35) & (occ < 0.7))
        idx = np.arange(n * n).reshape(n, n)
        empty = ~(np.asarray(a) | np.asarray(b))
        e_idx = np.where(empty, idx, big)
        e_idx_neg = np.where(empty, idx, -1)
        seed_min = jnp.asarray(
            np.stack([flood.neighbor_min(jnp.asarray(e), big) for e in e_idx])
        ).astype(jnp.int32)
        seed_max = jnp.asarray(
            np.stack([flood.neighbor_max(jnp.asarray(e), -1) for e in e_idx_neg])
        ).astype(jnp.int32)
        mn_s, mx_s = flood.flood_min_max_two_colors(seed_min, seed_max, a, b, big)
        mn_f, mx_f = flood_fast.flood_min_max_two_colors_fast(
            seed_min, seed_max, a, b, big
        )
        np.testing.assert_array_equal(
            np.where(np.asarray(a | b), np.asarray(mn_s), 0),
            np.where(np.asarray(a | b), np.asarray(mn_f), 0),
        )
        np.testing.assert_array_equal(
            np.where(np.asarray(a | b), np.asarray(mx_s), 0),
            np.where(np.asarray(a | b), np.asarray(mx_f), 0),
        )


def test_minmax_all_variants_agree():
    """simple / unrolled / sweep / hybrid must be bit-identical."""
    from gymgo_tpu.core.flood import (
        flood_min_max_two_colors,
        flood_min_max_two_colors_unrolled,
        neighbor_min,
        neighbor_max,
    )
    from gymgo_tpu.core.flood_fast import (
        flood_min_max_two_colors_fast,
        flood_min_max_two_colors_hybrid,
    )

    rng = np.random.default_rng(9)
    n = 9
    big = n * n
    occ = rng.random((8, n, n))
    a = jnp.asarray(occ < 0.35)
    b = jnp.asarray((occ >= 0.35) & (occ < 0.7))
    idx = jnp.arange(big).reshape(n, n).astype(jnp.int32)
    empty = ~(a | b)
    seed_min = neighbor_min(jnp.where(empty, idx, big), big)
    seed_max = neighbor_max(jnp.where(empty, idx, -1), -1)
    outs = [
        flood_min_max_two_colors(seed_min, seed_max, a, b, big),
        flood_min_max_two_colors_unrolled(seed_min, seed_max, a, b, big),
        flood_min_max_two_colors_fast(seed_min, seed_max, a, b, big),
        flood_min_max_two_colors_hybrid(seed_min, seed_max, a, b, big),
        flood_min_max_two_colors_hybrid(seed_min, seed_max, a, b, big, num_sweeps=1),
    ]
    stones = np.asarray(a | b)
    ref_mn = np.where(stones, np.asarray(outs[0][0]), 0)
    ref_mx = np.where(stones, np.asarray(outs[0][1]), 0)
    for mn, mx in outs[1:]:
        np.testing.assert_array_equal(ref_mn, np.where(stones, np.asarray(mn), 0))
        np.testing.assert_array_equal(ref_mx, np.where(stones, np.asarray(mx), 0))


def test_flood_or_unrolled_agrees():
    from gymgo_tpu.core.flood import flood_or, flood_or_unrolled

    rng = np.random.default_rng(4)
    mask = jnp.asarray(rng.random((8, 9, 9)) < 0.6)
    seed = jnp.asarray(rng.random((8, 9, 9)) < 0.1) & mask
    np.testing.assert_array_equal(
        np.asarray(flood_or(seed, mask)),
        np.asarray(flood_or_unrolled(seed, mask)),
    )


def test_split_variant_classification_agrees():
    """The split (mn + second-liberty-bit) variant must give the same
    0/1/>=2 liberty classification as the exact (mn, mx) floods (its mx is
    synthetic, so only the classification is comparable)."""
    from gymgo_tpu.core.flood import (
        flood_min_max_two_colors,
        flood_min_max_two_colors_split,
        neighbor_min,
        neighbor_max,
    )

    rng = np.random.default_rng(21)
    n = 9
    big = n * n
    for _ in range(4):
        occ = rng.random((8, n, n))
        a = jnp.asarray(occ < 0.35)
        b = jnp.asarray((occ >= 0.35) & (occ < 0.7))
        idx = jnp.arange(big).reshape(n, n).astype(jnp.int32)
        empty = ~(a | b)
        seed_min = neighbor_min(jnp.where(empty, idx, big), big)
        seed_max = neighbor_max(jnp.where(empty, idx, -1), -1)
        mn_r, mx_r = flood_min_max_two_colors(seed_min, seed_max, a, b, big)
        mn_s, mx_s = flood_min_max_two_colors_split(seed_min, seed_max, a, b, big)
        stones = np.asarray(a | b)

        def classify(mn, mx):
            mn, mx = np.asarray(mn), np.asarray(mx)
            has = mn < big
            one = has & (mn == mx)
            multi = mn < mx
            return (
                np.where(stones, has, 0),
                np.where(stones, one, 0),
                np.where(stones, multi, 0),
            )

        for x, y in zip(classify(mn_r, mx_r), classify(mn_s, mx_s)):
            np.testing.assert_array_equal(x, y)


@pytest.mark.slow
def test_bundle_variants_agree():
    """flood_bundle_bitpack, flood_bundle_gatepack (all jump sets), and the
    from-parts fallback must produce identical (one_lib, multi_lib, only_a,
    only_b, atari_enc) on random two-color boards."""
    from gymgo_tpu.core.flood import (
        flood_bundle_bitpack,
        flood_bundle_from_parts,
        flood_bundle_gatepack,
    )

    rng = np.random.default_rng(33)
    for n in (5, 9, 19):
        occ = rng.random((8, n, n))
        a = jnp.asarray(occ < 0.35)
        b = jnp.asarray((occ >= 0.35) & (occ < 0.7))
        ref = flood_bundle_bitpack(a, b, n)
        outs = [
            flood_bundle_from_parts(a, b, n),
            flood_bundle_gatepack(a, b, n, jumps=(1,)),
            flood_bundle_gatepack(a, b, n, jumps=(1, 2)),
            flood_bundle_gatepack(a, b, n, jumps=(1, 2, 4)),
            flood_bundle_gatepack(a, b, n, jumps=(1, 2), unroll=2),
        ]
        for out in outs:
            for r, o in zip(ref, out):
                np.testing.assert_array_equal(np.asarray(r), np.asarray(o))


def test_bundle_gatepack_adversarial():
    """Serpentine single-group worst case: long geodesic exercising the jump
    gates across bends, plus an empty serpentine for the claim bits."""
    from gymgo_tpu.core.flood import flood_bundle_bitpack, flood_bundle_gatepack

    n = 19
    serp = _serpentine_mask(n)
    # board 0: serpentine black group; board 1: serpentine EMPTY corridor
    # carved out of a full black board (claim-bit propagation path).
    a = jnp.asarray(np.stack([serp, ~serp]))
    b = jnp.zeros_like(a)
    ref = flood_bundle_bitpack(a, b, n)
    for jumps in ((1,), (1, 2), (1, 2, 4)):
        out = flood_bundle_gatepack(a, b, n, jumps=jumps)
        for r, o in zip(ref, out):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(o))
