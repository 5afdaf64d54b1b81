"""Reference-protocol single-env benchmark harness (SURVEY §5.1, §6).

Reproduces the measurement protocol of the reference's
gym_go/tests/efficiency.py (9x9 board, 64 iterations: scripted 79-move
games; copy+RNG lower bound; random self-play with children() each step) so
numbers are directly comparable across engines:

  --engine jax        our GoEnv via the jitted device kernels
  --engine native     our GoEnv via the C++ host engine
  --engine default    our GoEnv with its out-of-the-box backend="auto"
  --engine reference  the actual reference numpy engine (oracle shims)

Run: python benchmarks/efficiency.py --engine native
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_ROOT, os.path.join(_ROOT, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


def make_env(engine: str, boardsize: int):
    if engine == "reference":
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from reference_oracle import load_reference_gogame

        ref = load_reference_gogame()

        class RefEnv:
            """Minimal GoEnv-equivalent over the reference gogame module
            (the real reference env needs classic gym + pyglet)."""

            size = boardsize

            def reset(self):
                self.state_ = ref.init_state(boardsize)
                self.done = False
                return np.copy(self.state_)

            def step(self, a):
                if a is None:
                    a = boardsize ** 2
                elif isinstance(a, tuple):
                    a = a[0] * boardsize + a[1]
                self.state_ = ref.next_state(self.state_, a)
                self.done = bool(ref.game_ended(self.state_))
                reward = ref.winning(self.state_) if self.done else 0
                info = {
                    "turn": ref.turn(self.state_),
                    "invalid_moves": ref.invalid_moves(self.state_),
                    "prev_player_passed": ref.prev_player_passed(self.state_),
                }
                return np.copy(self.state_), reward, self.done, info

            def valid_moves(self):
                return ref.valid_moves(self.state_)

            def children(self, canonical=False, padded=True):
                return ref.children(self.state_, canonical, padded)

        return RefEnv()
    from gymgo_tpu.env import GoEnv

    if engine == "default":
        return GoEnv(size=boardsize, reward_method="real")
    backend = "native" if engine == "native" else "jax"
    return GoEnv(size=boardsize, reward_method="real", backend=backend)


def ordered_trajs(env, boardsize, iterations):
    durs = []
    for _ in range(iterations):
        start = time.time()
        env.reset()
        for a in range(boardsize ** 2 - 2):
            env.step(a)
        durs.append(time.time() - start)
    print(f"Ordered Trajs: {np.mean(durs):.3f} AVG, {np.std(durs):.3f} STD", flush=True)
    return float(np.mean(durs))


def lower_bound(env, boardsize, iterations):
    durs = []
    for _ in range(iterations):
        start = time.time()
        state = env.reset()
        max_steps = boardsize ** 2
        for s in range(max_steps):
            for _ in range(max_steps - s):
                np.copy(state)
            pi = np.ones(boardsize ** 2 + 1) / (boardsize ** 2 + 1)
            np.random.choice(np.arange(boardsize ** 2 + 1), p=pi)
            np.copy(state)
        durs.append(time.time() - start)
    print(f"Lower bound: {np.mean(durs):.3f} AVG, {np.std(durs):.3f} STD", flush=True)
    return float(np.mean(durs))


def rand_trajs_with_children(env, boardsize, iterations):
    durs, num_steps = [], []
    for _ in range(iterations):
        start = time.time()
        env.reset()
        max_steps = 2 * boardsize ** 2
        s = 0
        for s in range(max_steps):
            valid_moves = env.valid_moves()
            env.children(canonical=True)
            if np.sum(valid_moves) > 1:
                valid_moves[-1] = 0
            probs = valid_moves / np.sum(valid_moves)
            a = np.random.choice(np.arange(boardsize ** 2 + 1), p=probs)
            _, _, done, _ = env.step(a)
            if done:
                break
        num_steps.append(s)
        durs.append(time.time() - start)
    print(
        f"Rand Trajs w/ Children: {np.mean(durs):.3f} AVG SEC, "
        f"{np.std(durs):.3f} STD SEC, {np.mean(num_steps):.1f} AVG STEPS",
        flush=True,
    )
    return float(np.mean(durs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", choices=["jax", "native", "default", "reference"], default="native")
    ap.add_argument("--boardsize", type=int, default=9)
    ap.add_argument("--iterations", type=int, default=64)
    ap.add_argument("--skip-children", action="store_true")
    ap.add_argument("--cpu", action="store_true", default=True,
                    help="force the CPU backend (default: this protocol is a "
                         "single-env host-latency benchmark; the tunneled TPU "
                         "would add ~30ms RTT per step)")
    ap.add_argument("--tpu", dest="cpu", action="store_false")
    args = ap.parse_args()

    if args.cpu and args.engine != "reference":
        import jax

        jax.config.update("jax_platforms", "cpu")

    np.random.seed(0)
    env = make_env(args.engine, args.boardsize)
    print(f"engine={args.engine} boardsize={args.boardsize} iters={args.iterations}")
    ordered_trajs(env, args.boardsize, args.iterations)
    lower_bound(env, args.boardsize, args.iterations)
    if not args.skip_children:
        rand_trajs_with_children(env, args.boardsize, args.iterations)


if __name__ == "__main__":
    main()
