"""Per-component cost ablation for the MCTS search step.

One Gumbel/PUCT simulation at (B, 19x19) pays for: the selection table
build + walk, ONE exact env step (step_states), one net eval on the new
leaves (masked_policy = canonical form + valid moves + apply), the node
writes, and the backup scatter.  This times each piece standalone with the
tunnel-safe checksum fetch, so optimization effort goes where the
milliseconds are (round-1 lesson: the bench only showed the aggregate and
we blamed the wrong component).

Usage: timeout 580 python scripts/search_cost_ablation.py [--batch 256]
       [--board 19 --sims 32 --channels 8 --blocks 1] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, repeats=5):
    out = fn(*args)
    float(out[1] if isinstance(out, tuple) else out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out[1] if isinstance(out, tuple) else out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--board", type=int, default=19)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--sims", type=int, default=32)
    ap.add_argument("--channels", type=int, default=8)
    ap.add_argument("--blocks", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core import actions as _actions
    from gymgo_tpu.core import state as _state
    from gymgo_tpu.core import step as _step
    from gymgo_tpu.core import transform as _transform
    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.env.batch_env import rollout
    from gymgo_tpu.models import AZNet, AZNetConfig, init_params
    from gymgo_tpu.rl import treewalk as _treewalk

    n, b, m = args.board, args.batch, args.sims + 1
    a = n * n + 1
    netcfg = AZNetConfig(board_size=n, channels=args.channels,
                         blocks=args.blocks)
    net = AZNet(netcfg)
    params = init_params(jax.random.PRNGKey(0), netcfg)
    cfg = EnvConfig(board_size=n, batch_size=b, auto_reset=True)

    @jax.jit
    def warm(key, states):
        r = rollout(key, states, 64, cfg)
        return r.final_states, jnp.sum(r.rewards)

    key = jax.random.PRNGKey(1)
    states = batch_init_state(b, n)
    for i in range(2):
        states, c = warm(jax.random.fold_in(key, i), states)
    float(c)
    print(f"backend={jax.default_backend()} B={b} board={n} "
          f"net={args.channels}ch x{args.blocks}", flush=True)

    acts = jax.jit(_actions.uniform_random_actions)(key, states)

    # 1. one exact env step
    @jax.jit
    def env_step(s, acts):
        ns, info = _step.step_states(s, acts)
        return ns, jnp.sum(info.black_area)

    t = bench(env_step, states, acts)
    print(f"step_states:            {t * 1e3:7.2f} ms "
          f"(x{args.sims} sims = {t * args.sims * 1e3:6.1f} ms)", flush=True)

    # 2. net eval incl. canonical form + valid mask (masked_policy)
    @jax.jit
    def policy(s):
        logits, value = net.apply(params, _transform.batch_canonical_form(s))
        valid = _actions.batch_valid_moves(s) > 0
        probs = jax.nn.softmax(jnp.where(valid, logits, -jnp.inf), axis=-1)
        return probs, jnp.sum(value)

    t = bench(policy, states)
    print(f"masked_policy (net):    {t * 1e3:7.2f} ms "
          f"(x{args.sims} sims = {t * args.sims * 1e3:6.1f} ms)", flush=True)

    # 3. selection table build + walk over a representative random tree
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    scores = jax.random.uniform(k1, (b, m, a))
    child = jnp.where(
        jax.random.uniform(k2, (b, m, a)) < 0.05,
        jax.random.randint(k3, (b, m, a), 0, m),
        -1,
    ).astype(jnp.int32)
    node_done = jnp.zeros((b, m), bool)

    @jax.jit
    def select(scores, child):
        tables = _treewalk.node_tables(scores, child, node_done)
        depth, path_n, path_a = _treewalk.walk_paths(*tables, m)
        return path_n, jnp.sum(depth)

    t = bench(select, scores, child)
    print(f"selection (tables+walk):{t * 1e3:7.2f} ms "
          f"(x{args.sims} sims = {t * args.sims * 1e3:6.1f} ms)", flush=True)

    # 4. node write set: states row scatter + child pointer + backup
    node_states = jnp.zeros((b, m, 6, n, n), jnp.int8)
    visit = jnp.zeros((b, m, a), jnp.int32)
    wsum = jnp.zeros((b, m, a), jnp.float32)
    bidx = jnp.arange(b)
    exp_parent = jax.random.randint(key, (b,), 0, m)
    path_n = jax.random.randint(k1, (b, m), 0, m)
    path_a = jax.random.randint(k2, (b, m), 0, a)
    depth = jax.random.randint(k3, (b,), 1, m)

    @jax.jit
    def node_write(node_states, s):
        ns = node_states.at[bidx, exp_parent].set(s)
        return ns, jnp.sum(ns[:, 0, 0, 0, 0])

    t = bench(node_write, node_states, states)
    print(f"node_states row scatter:{t * 1e3:7.2f} ms "
          f"(x{args.sims} sims = {t * args.sims * 1e3:6.1f} ms)", flush=True)

    # 5. parent state gather (expansion input)
    @jax.jit
    def node_read(node_states, exp_parent):
        s = node_states[bidx, exp_parent]
        return s, jnp.sum(s[:, 0, 0, 0])

    t = bench(node_read, node_states, exp_parent)
    print(f"node_states row gather: {t * 1e3:7.2f} ms "
          f"(x{args.sims} sims = {t * args.sims * 1e3:6.1f} ms)", flush=True)

    # 6. backup scatter-add
    @jax.jit
    def backup(visit, wsum):
        def one(pv, pw, pn, pa, d):
            iota = jnp.arange(m)
            on = iota < d
            nodes = jnp.where(on, pn, 0)
            acs = jnp.where(on, pa, 0)
            pv = pv.at[nodes, acs].add(on.astype(jnp.int32))
            pw = pw.at[nodes, acs].add(jnp.where(on, 1.0, 0.0))
            return pv, pw

        visit, wsum = jax.vmap(one)(visit, wsum, path_n, path_a, depth)
        return visit, jnp.sum(wsum[:, 0])

    t = bench(backup, visit, wsum)
    print(f"backup scatter-add:     {t * 1e3:7.2f} ms "
          f"(x{args.sims} sims = {t * args.sims * 1e3:6.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
