"""Extended randomized parity fuzz vs the reference engine (manual / CI-long).

Plays many full random games per board size, comparing every state
bit-for-bit between the reference numpy engine, the JAX engine, and the C++
native engine.  The pytest suite runs a fast subset; this script is the
deep soak: python scripts/fuzz_parity.py --games 200 --sizes 5 7 9
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=100)
    ap.add_argument("--sizes", type=int, nargs="+", default=[5, 7, 9])
    ap.add_argument("--max-steps", type=int, default=400)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from reference_oracle import load_reference_gogame
    from gymgo_tpu import gogame
    from gymgo_tpu.native import NativeGoEngine

    ref = load_reference_gogame()
    total_steps = 0
    for size in args.sizes:
        eng = NativeGoEngine(size)
        for game in range(args.games):
            np.random.seed(hash((size, game)) % (1 << 31))
            s_ref = ref.init_state(size)
            s_jax = gogame.init_state(size)
            s_nat = np.zeros((6, size, size), np.int8)
            for t in range(args.max_steps):
                if ref.game_ended(s_ref):
                    break
                a = ref.random_action(s_ref)
                s_ref = ref.next_state(s_ref, a)
                s_jax = gogame.next_state(s_jax, a)
                s_nat, status = eng.next_state(s_nat, int(a))
                assert status == 0
                if not np.array_equal(s_ref, s_jax):
                    raise AssertionError(
                        f"JAX mismatch size={size} game={game} step={t} action={a}"
                    )
                if not np.array_equal(s_ref.astype(np.int8), s_nat):
                    raise AssertionError(
                        f"native mismatch size={size} game={game} step={t} action={a}"
                    )
                total_steps += 1
            if (game + 1) % 20 == 0:
                print(f"size {size}: {game + 1}/{args.games} games OK "
                      f"({total_steps:,} steps checked)", flush=True)
    print(f"PARITY FUZZ PASSED: {total_steps:,} steps bit-exact across 3 engines")


if __name__ == "__main__":
    main()
