"""Measure the per-env flood-convergence distribution at steady state.

The bitpack classification flood (core/flood.py:flood_bundle_bitpack) runs
under ONE `lax.while_loop` over the whole batch, so every step pays the
BATCH-MAX trip count.  A Pallas kernel with a grid over env blocks could
instead converge each block independently (per-block while loop in VMEM).
This script quantifies the available win: for each of T consecutive
steady-state steps it records every env's individual convergence substep
count, then reports, per candidate block size K, the work ratio

    sum_t mean_blocks(max_block conv) / sum_t max_batch(conv)

i.e. the fraction of flood substep-work a per-block-convergent kernel would
execute relative to the current batch-max loop (1.0 = no win).

Run: timeout 900 python scripts/measure_convergence.py [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--board", type=int, default=19)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--warmup-steps", type=int, default=768)
    ap.add_argument("--measure-steps", type=int, default=64)
    ap.add_argument("--maxk", type=int, default=96, help="substep budget")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core import actions as _actions
    from gymgo_tpu.core import step as _step
    from gymgo_tpu.core.flood import shift
    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.env.batch_env import rollout

    n = args.board
    cfg = EnvConfig(board_size=n, batch_size=args.batch,
                    reward_method="heuristic", auto_reset=True)

    def conv_counts(black, white):
        """Per-env substep count until the bitpack bundle flood converges.

        Mirrors flood_bundle_bitpack's seed/gates and its alternating
        fwd/rev direction schedule so counts map 1:1 onto real substeps.
        """
        mask9 = jnp.int32((1 << 9) - 1)
        bit_a = jnp.int32(1 << 18)
        bit_b = jnp.int32(1 << 19)
        stones = black | white
        empty = ~stones
        rows = lax.broadcasted_iota(jnp.int32, black.shape, black.ndim - 2)
        cols = lax.broadcasted_iota(jnp.int32, black.shape, black.ndim - 1)
        v = jnp.where(empty, rows * n + cols + 1, 0)
        inv_v = jnp.where(empty, (~(rows * n + cols + 1)) & mask9, 0)
        packed_cell = v | (inv_v << 9)
        zero = jnp.int32(0)
        f = jnp.zeros((), jnp.bool_)
        dirs = ((1, 0), (-1, 0), (0, 1), (0, -1))
        seed = zero
        touch_a = jnp.zeros(black.shape, jnp.bool_)
        touch_b = jnp.zeros(black.shape, jnp.bool_)
        for (dr, dc) in dirs:
            seed = seed | shift(packed_cell, dr, dc, zero)
            touch_a = touch_a | shift(black, dr, dc, f)
            touch_b = touch_b | shift(white, dr, dc, f)
        seed = jnp.where(stones, seed, zero)
        seed = seed | jnp.where(empty & touch_a, bit_a, zero)
        seed = seed | jnp.where(empty & touch_b, bit_b, zero)
        same = tuple(
            (black & shift(black, dr, dc, f))
            | (white & shift(white, dr, dc, f))
            | (empty & shift(empty, dr, dc, f))
            for (dr, dc) in dirs
        )
        fwd = tuple(zip(dirs, same))
        rev = tuple(reversed(fwd))

        def substep(x, order):
            for (dr, dc), same_d in order:
                x = x | jnp.where(same_d, shift(x, dr, dc, zero), zero)
            return x

        # The real loop alternates fwd/rev per substep; bake two substeps
        # (fwd then rev) per fori iteration to keep the schedule static.
        claim_mask = jnp.int32((1 << 18) | (1 << 19))

        def chg(a, b, sel):
            d = (a ^ b) & sel
            return jnp.any(d.reshape(a.shape[0], -1) != 0, axis=1)

        def body2(k, carry):
            x, conv, conv_s, conv_c = carry
            x1 = substep(x, fwd)
            x2 = substep(x1, rev)
            for step_idx, (a, b) in enumerate(((x, x1), (x1, x2))):
                t = 2 * k + 1 + step_idx
                conv = jnp.where(chg(a, b, jnp.int32(-1)), t, conv)
                conv_s = jnp.where(chg(a, b, ~claim_mask), t, conv_s)
                conv_c = jnp.where(chg(a, b, claim_mask), t, conv_c)
            return (x2, conv, conv_s, conv_c)

        z = jnp.zeros((black.shape[0],), jnp.int32)
        _, conv, conv_s, conv_c = lax.fori_loop(
            0, args.maxk // 2, body2, (seed, z, z, z))
        return jnp.stack([conv, conv_s, conv_c])

    def measure(key, states):
        ps0 = _step.planes_from_states(states)
        ps0 = ps0._replace(atari=_step.init_atari(ps0))

        def body(carry, _):
            ps, k = carry
            k, sub = jax.random.split(k)
            ps = jax.tree.map(
                lambda x: jnp.where(
                    ps.done.reshape((-1,) + (1,) * (x.ndim - 1)),
                    jnp.zeros_like(x), x),
                ps,
            )
            acts = _actions.uniform_random_actions_planes(sub, ps)
            ps, _info = _step.step_planes(ps, acts)
            # post-step (black, white) IS the frozen-resolved post-capture
            # board this step's bundle flooded
            conv = conv_counts(ps.black, ps.white)
            return (ps, k), (conv, jnp.sum(ps.black | ps.white, dtype=jnp.int32))

        (_fps, _), (convs, stones) = lax.scan(body, (ps0, key), None,
                                              length=args.measure_steps)
        return convs, stones  # (T, 3, B), (T,)

    jit_measure = jax.jit(measure)

    @jax.jit
    def warm(key, states):
        r = rollout(key, states, 64, cfg)
        return r.final_states, jnp.sum(r.rewards)

    key = jax.random.PRNGKey(0)
    states = batch_init_state(args.batch, n)
    log(f"backend={jax.default_backend()}")
    t0 = time.perf_counter()
    states, c = warm(key, states)
    float(c)
    log(f"warm compile+run {time.perf_counter()-t0:.1f}s")
    for i in range((args.warmup_steps - 64) // 64):
        states, c = warm(jax.random.fold_in(key, 1000 + i), states)
    float(c)
    log(f"warmup done {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    convs3, stones = jit_measure(jax.random.fold_in(key, 7), states)
    convs3 = np.asarray(convs3)
    convs, convs_stone, convs_claim = convs3[:, 0], convs3[:, 1], convs3[:, 2]
    log(f"measure done {time.perf_counter()-t0:.1f}s shape={convs.shape} "
        f"max={convs.max()} (budget {args.maxk})")
    for name, cc in (("stone-bits", convs_stone), ("claim-bits", convs_claim)):
        bm = cc.max(axis=1)
        print(f"{name}: per-env mean={cc.mean():.1f} p99={np.percentile(cc,99):.0f} "
              f"max={cc.max()}; batch-max mean={bm.mean():.1f}")

    if convs.max() >= args.maxk - 2:
        log("WARNING: budget possibly exceeded; raise --maxk")

    T, B = convs.shape
    batch_max = convs.max(axis=1)  # (T,)
    print(f"steady-state {n}x{n} B={B}, T={T} steps")
    print(f"per-env conv substeps: mean={convs.mean():.1f} "
          f"p50={np.percentile(convs,50):.0f} p90={np.percentile(convs,90):.0f} "
          f"p99={np.percentile(convs,99):.0f} max={convs.max()}")
    print(f"batch-max per step: mean={batch_max.mean():.1f} "
          f"min={batch_max.min()} max={batch_max.max()}")
    total_batchmax = batch_max.sum()
    for K in (8, 16, 32, 64, 128, 256, 512, 1024, 4096):
        if K > B:
            continue
        blocks = convs.reshape(T, B // K, K).max(axis=2)  # (T, nblocks)
        work = blocks.mean(axis=1).sum()
        print(f"block K={K:5d}: mean block-max={blocks.mean():6.1f}  "
              f"work ratio vs batch-max={work/total_batchmax:.3f}")


if __name__ == "__main__" and "--warm-study" not in sys.argv:
    main()


def warm_start_study():
    """Simulate a SOUND warm-started flood and measure its trip counts.

    Warm rule (x0 = seed | (F_prev & keep)): drop cells whose converged
    word could exceed the new fixpoint —
      * the played cell p and captured cells (class changed),
      * stones whose F_prev word matches any stone neighbor of p (groups
        that lost liberty p; mover merges are adjacent to p too),
      * ALL empty cells of envs where p touched empties or captures
        happened (region split / touch-loss; claims re-converge in <= ~18),
    everything else is <= the new fixpoint (monotone growth), so OR-flood
    from x0 reaches the same fixpoint.  The study VERIFIES fixpoint
    equality against the cold flood every step and reports warm vs cold
    conv substeps.
    """
    import argparse as _ap
    import time
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core import actions as _actions
    from gymgo_tpu.core import step as _step
    from gymgo_tpu.core.flood import shift
    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.env.batch_env import rollout

    ap = _ap.ArgumentParser()
    ap.add_argument("--board", type=int, default=19)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--warmup-steps", type=int, default=768)
    ap.add_argument("--measure-steps", type=int, default=64)
    ap.add_argument("--maxk", type=int, default=96)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--warm", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    n = args.board
    cfg = EnvConfig(board_size=n, batch_size=args.batch,
                    reward_method="heuristic", auto_reset=True)

    mask9 = jnp.int32((1 << 9) - 1)
    bit_a = jnp.int32(1 << 18)
    bit_b = jnp.int32(1 << 19)
    zero = jnp.int32(0)
    dirs = ((1, 0), (-1, 0), (0, 1), (0, -1))

    def flood_parts(black, white):
        stones = black | white
        empty = ~stones
        rows = lax.broadcasted_iota(jnp.int32, black.shape, black.ndim - 2)
        cols = lax.broadcasted_iota(jnp.int32, black.shape, black.ndim - 1)
        v = jnp.where(empty, rows * n + cols + 1, 0)
        inv_v = jnp.where(empty, (~(rows * n + cols + 1)) & mask9, 0)
        packed_cell = v | (inv_v << 9)
        f = jnp.zeros((), jnp.bool_)
        seed = zero
        ta = jnp.zeros(black.shape, jnp.bool_)
        tb = jnp.zeros(black.shape, jnp.bool_)
        for (dr, dc) in dirs:
            seed = seed | shift(packed_cell, dr, dc, zero)
            ta = ta | shift(black, dr, dc, f)
            tb = tb | shift(white, dr, dc, f)
        seed = jnp.where(stones, seed, zero)
        seed = seed | jnp.where(empty & ta, bit_a, zero)
        seed = seed | jnp.where(empty & tb, bit_b, zero)
        same = tuple(
            (black & shift(black, dr, dc, f))
            | (white & shift(white, dr, dc, f))
            | (empty & shift(empty, dr, dc, f))
            for (dr, dc) in dirs
        )
        return seed, same

    def run_flood(x0, same, maxk):
        fwd = tuple(zip(dirs, same))
        rev = tuple(reversed(fwd))

        def substep(x, order):
            for (dr, dc), same_d in order:
                x = x | jnp.where(same_d, shift(x, dr, dc, zero), zero)
            return x

        def body(k, carry):
            x, conv = carry
            x1 = substep(x, fwd)
            c1 = jnp.any((x1 != x).reshape(x.shape[0], -1), axis=1)
            conv = jnp.where(c1, 2 * k + 1, conv)
            x2 = substep(x1, rev)
            c2 = jnp.any((x2 != x1).reshape(x.shape[0], -1), axis=1)
            conv = jnp.where(c2, 2 * k + 2, conv)
            return (x2, conv)

        z = jnp.zeros((x0.shape[0],), jnp.int32)
        return lax.fori_loop(0, maxk // 2, body, (x0, z))

    def measure(key, states):
        ps0 = _step.planes_from_states(states)
        ps0 = ps0._replace(atari=_step.init_atari(ps0),
                           ko_surr=_step.init_ko_surr(ps0))
        seed0, same0 = flood_parts(ps0.black, ps0.white)
        f0, _ = run_flood(seed0, same0, args.maxk)

        def body(carry, _):
            ps, fprev, k = carry
            prev_black, prev_white = ps.black, ps.white
            k, sub = jax.random.split(k)
            reset = ps.done
            ps = jax.tree.map(
                lambda x: jnp.where(
                    reset.reshape((-1,) + (1,) * (x.ndim - 1)),
                    jnp.zeros_like(x), x),
                ps,
            )
            fprev = jnp.where(reset[:, None, None], 0, fprev)
            prev_black = jnp.where(reset[:, None, None], False, prev_black)
            prev_white = jnp.where(reset[:, None, None], False, prev_white)
            acts = _actions.uniform_random_actions_planes(sub, ps)
            nps, info = _step.step_planes(ps, acts)
            b = acts.shape[0]
            rows = lax.broadcasted_iota(jnp.int32, nps.black.shape, 1)
            cols = lax.broadcasted_iota(jnp.int32, nps.black.shape, 2)
            board_idx = jnp.clip(acts, 0, n * n - 1)
            is_pass = acts == n * n
            frozen = info.was_done | info.invalid_action | is_pass
            place = (
                (rows == (board_idx // n)[:, None, None])
                & (cols == (board_idx % n)[:, None, None])
                & ~frozen[:, None, None]
            )
            prev_stones = prev_black | prev_white
            # stale stone words: F_prev at p's stone-neighbor cells
            f = jnp.zeros((), jnp.bool_)
            nbr_words = []
            for (dr, dc) in dirs:
                sel = shift(place, dr, dc, f) & prev_stones
                w = jnp.sum(jnp.where(sel, fprev, 0).reshape(b, -1), axis=1)
                ok = jnp.any(sel.reshape(b, -1), axis=1)
                nbr_words.append((w, ok))
            stale_stone = jnp.zeros(nps.black.shape, jnp.bool_)
            for (w, ok) in nbr_words:
                stale_stone = stale_stone | (
                    prev_stones & (fprev == w[:, None, None]) & ok[:, None, None]
                )
            captured = prev_stones & ~(nps.black | nps.white) & ~frozen[:, None, None]
            any_cap = jnp.any(captured.reshape(b, -1), axis=1)
            touched_empty = jnp.any(
                (place & ~prev_stones).reshape(b, -1), axis=1
            ) | jnp.any((shift(place, 1, 0, f) | shift(place, -1, 0, f)
                         | shift(place, 0, 1, f) | shift(place, 0, -1, f))
                        .reshape(b, -1) & (~prev_stones).reshape(b, -1), axis=1)
            reset_empty = (any_cap | touched_empty)[:, None, None]
            new_stones = nps.black | nps.white
            drop = (
                stale_stone
                | place
                | captured
                | (~new_stones & reset_empty)
            )
            keep = ~drop
            # frozen envs keep their exact old fixpoint (board unchanged)
            seed, same = flood_parts(nps.black, nps.white)
            x0_warm = jnp.where(
                frozen[:, None, None], fprev, seed | jnp.where(keep, fprev, 0)
            )
            fx_warm, conv_w = run_flood(x0_warm, same, args.maxk)
            fx_cold, conv_c = run_flood(seed, same, args.maxk)
            equal = jnp.all((fx_warm == fx_cold).reshape(b, -1), axis=1)
            return (nps, fx_cold, k), (conv_w, conv_c, jnp.all(equal))

        (_ps, _f, _), (cw, cc, eq) = lax.scan(
            body, (ps0, f0, key), None, length=args.measure_steps)
        return cw, cc, eq

    @jax.jit
    def warm(key, states):
        r = rollout(key, states, 64, cfg)
        return r.final_states, jnp.sum(r.rewards)

    key = jax.random.PRNGKey(0)
    states = batch_init_state(args.batch, n)
    t0 = time.perf_counter()
    states, c = warm(key, states)
    float(c)
    for i in range((args.warmup_steps - 64) // 64):
        states, c = warm(jax.random.fold_in(key, 1000 + i), states)
    float(c)
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    cw, cc, eq = jax.jit(measure)(jax.random.fold_in(key, 7), states)
    cw, cc, eq = np.asarray(cw), np.asarray(cc), np.asarray(eq)
    print(f"fixpoint equality every step: {bool(eq.all())}")
    print(f"cold: per-env mean={cc.mean():.1f} batch-max mean={cc.max(1).mean():.1f}")
    print(f"warm: per-env mean={cw.mean():.1f} batch-max mean={cw.max(1).mean():.1f} "
          f"p99 of batch-max={np.percentile(cw.max(1),99):.0f}")


if __name__ == "__main__" and "--warm-study" in sys.argv:
    sys.argv.remove("--warm-study")
    warm_start_study()
    sys.exit(0)
