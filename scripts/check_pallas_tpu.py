"""On-TPU validation + microbenchmark of the Pallas flood kernel vs the XLA
flood (run manually on TPU hardware: python scripts/check_pallas_tpu.py)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gymgo_tpu.config import EnvConfig
from gymgo_tpu.core import flood
from gymgo_tpu.core.state import batch_init_state
from gymgo_tpu.env.batch_env import rollout
from gymgo_tpu.ops.pallas_flood import minmax_liberty_flood_pallas


def main():
    n, b = 19, 4096
    cfg = EnvConfig(board_size=n, batch_size=b, reward_method="heuristic",
                    auto_reset=True)
    warm = jax.jit(lambda k, s: rollout(k, s, 768, cfg).final_states)
    states = warm(jax.random.PRNGKey(0), batch_init_state(b, n))
    black = states[:, 0].astype(bool)
    white = states[:, 1].astype(bool)
    big = n * n
    idx = jnp.arange(big).reshape(n, n).astype(jnp.int32)
    empty = ~(black | white)
    seed_min = flood.neighbor_min(jnp.where(empty, idx, big), big)
    seed_max = flood.neighbor_max(jnp.where(empty, idx, -1), -1)
    xla_fn = jax.jit(
        lambda sm, sx, a, bb: flood.flood_min_max_two_colors_unrolled(
            sm, sx, a, bb, big))

    mn_x, mx_x = xla_fn(seed_min, seed_max, black, white)
    mn_p, mx_p = minmax_liberty_flood_pallas(black, white, tile=256)
    stones = np.asarray(black | white)
    ok = np.array_equal(
        np.where(stones, np.asarray(mn_x), 0), np.where(stones, np.asarray(mn_p), 0)
    ) and np.array_equal(
        np.where(stones, np.asarray(mx_x), 0), np.where(stones, np.asarray(mx_p), 0)
    )
    print("pallas-vs-xla parity on steady-state boards:", ok)
    assert ok

    def time_many(name, fn, reps=3, k=50):
        @jax.jit
        def run():
            def body(c, _):
                outs = fn()
                return c + sum(jnp.sum(o.astype(jnp.int32)) for o in outs), ()
            tot, _ = lax.scan(body, jnp.int32(0), None, length=k)
            return tot
        float(run())
        best = min(
            (lambda: (lambda t0: (float(run()), time.perf_counter() - t0)[1])(
                time.perf_counter()))()
            for _ in range(reps)
        )
        print(f"{name}: {best / k * 1000:.3f} ms/call")

    time_many("xla flood", lambda: xla_fn(seed_min, seed_max, black, white))
    for tile in (256, 512):
        time_many(f"pallas tile={tile}",
                  lambda t=tile: minmax_liberty_flood_pallas(black, white, tile=t))


if __name__ == "__main__":
    main()
