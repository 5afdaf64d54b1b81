"""Per-component cost ablation for the MCTS search step.

One Gumbel/PUCT simulation at (B, 19x19) pays for: the selection table
build + walk, ONE exact env step (step_states), one net eval on the new
leaves (masked_policy = canonical form + valid moves + apply), the node
writes, and the backup scatter.  This times each piece, so optimization
effort goes where the milliseconds are.

Methodology: a single jitted call through the tunnel costs ~23 ms of
dispatch latency (measured: every standalone component "cost" the same),
so each component runs ``--sims`` iterations inside ONE ``lax.fori_loop``
with loop-carried data dependence (inputs perturbed per iteration by the
carried accumulator — XLA hoists loop-invariant bodies; BENCHMARKS.md
"never benchmark over constant inputs").  Reported per-iteration time has
the empty-loop call overhead subtracted.

Usage: timeout 580 python scripts/search_cost_ablation.py [--batch 256]
       [--board 19 --sims 32 --channels 8 --blocks 1] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from jax import lax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core import actions as _actions
    from gymgo_tpu.core import step as _step
    from gymgo_tpu.core import transform as _transform
    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.env.batch_env import rollout
    from gymgo_tpu.models import AZNet, AZNetConfig, init_params
    from gymgo_tpu.rl import treewalk as _treewalk

    n, b, sims = args.board, args.batch, args.sims
    m = sims + 1
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
          f"net={args.channels}ch x{args.blocks} sims/loop={sims}", flush=True)

    def timed(fn, *fn_args, repeats=5):
        out = fn(*fn_args)
        float(out if not isinstance(out, tuple) else out[-1])
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn(*fn_args)
            float(out if not isinstance(out, tuple) else out[-1])
            best = min(best, time.perf_counter() - t0)
        return best

    # call-overhead floor: empty fori_loop, one scalar out
    @jax.jit
    def null_loop(x):
        return lax.fori_loop(0, sims, lambda i, c: c + 1.0, x)

    overhead = timed(null_loop, jnp.float32(0))
    print(f"call overhead (null loop): {overhead * 1e3:6.1f} ms", flush=True)

    def report(name, total):
        per = (total - overhead) / sims
        print(f"{name:<26}{per * 1e3:7.3f} ms/sim   "
              f"(x{sims} = {(total - overhead) * 1e3:6.1f} ms + overhead)",
              flush=True)

    # 1. env step: states feed back each iteration (real data dependence)
    @jax.jit
    def env_loop(s0, key):
        def body(i, c):
            s, acc = c
            acts = _actions.uniform_random_actions(jax.random.fold_in(key, i), s)
            ns, info = _step.step_states(s, acts)
            return ns, acc + jnp.sum(info.num_captured)

        _, acc = lax.fori_loop(0, sims, body, (s0, jnp.int32(0)))
        return acc

    report("step_states", timed(env_loop, states, key))

    # 2. masked_policy: perturb one cell per iteration from the accumulator
    @jax.jit
    def policy_loop(s0):
        def body(i, c):
            s, acc = c
            s = s.at[:, 0, 0, 0].set((i % 2).astype(jnp.int8))
            logits, value = net.apply(params, _transform.batch_canonical_form(s))
            valid = _actions.batch_valid_moves(s) > 0
            probs = jax.nn.softmax(jnp.where(valid, logits, -jnp.inf), axis=-1)
            return s, acc + jnp.sum(value) + probs[0, 0]

        _, acc = lax.fori_loop(0, sims, body, (s0, jnp.float32(0)))
        return acc

    report("masked_policy (net)", timed(policy_loop, states))

    # 3. selection tables + walk over a representative random tree
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    scores0 = jax.random.uniform(k1, (b, m, a))
    child = jnp.where(
        jax.random.uniform(k2, (b, m, a)) < 0.05,
        jax.random.randint(k3, (b, m, a), 0, m),
        -1,
    ).astype(jnp.int32)
    node_done = jnp.zeros((b, m), bool)

    @jax.jit
    def select_loop(scores0, child):
        def body(i, c):
            scores, acc = c
            scores = scores.at[:, 0, 0].set(acc % 1.0)
            tables = _treewalk.node_tables(scores, child, node_done)
            depth, path_n, path_a = _treewalk.walk_paths(*tables, m)
            return scores, acc + jnp.sum(depth).astype(jnp.float32) * 1e-6

        _, acc = lax.fori_loop(0, sims, body, (scores0, jnp.float32(0)))
        return acc

    report("selection (tables+walk)", timed(select_loop, scores0, child))

    # 4. node write set: states row + prior row + child pointer
    prior0 = jnp.zeros((b, m, a), jnp.float32)
    node_states0 = jnp.zeros((b, m, 6, n, n), jnp.int8)
    bidx = jnp.arange(b)
    parent0 = jax.random.randint(key, (b,), 0, m)

    @jax.jit
    def write_loop(node_states0, prior0, s):
        def body(i, c):
            ns, pr, acc = c
            slot = i % m
            ns = ns.at[:, slot].set(s + acc.astype(jnp.int8))
            pr = pr.at[:, slot].set(acc.astype(jnp.float32))
            return ns, pr, acc + 1

        ns, pr, acc = lax.fori_loop(
            0, sims, body, (node_states0, prior0, jnp.int32(0))
        )
        return ns[0, 0, 0, 0, 0].astype(jnp.float32) + pr[0, 0, 0]

    report("node write (state+prior)", timed(write_loop, node_states0, prior0, states))

    # 5. parent state gather (expansion input), index depends on carry
    @jax.jit
    def read_loop(node_states, parent0):
        def body(i, c):
            p, acc = c
            s = node_states[bidx, p]
            acc = acc + jnp.sum(s[:, 0, 0, 0]).astype(jnp.int32)
            return (p + 1) % m, acc

        _, acc = lax.fori_loop(0, sims, body, (parent0, jnp.int32(0)))
        return acc

    report("node row gather", timed(read_loop, node_states0, parent0))

    # 6. backup scatter-add
    visit0 = jnp.zeros((b, m, a), jnp.int32)
    wsum0 = jnp.zeros((b, m, a), jnp.float32)
    path_n = jax.random.randint(k1, (b, m), 0, m)
    path_a = jax.random.randint(k2, (b, m), 0, a)
    depth = jax.random.randint(k3, (b,), 1, m)
    iota = jnp.arange(m)

    @jax.jit
    def backup_loop(visit0, wsum0):
        def one(pv, pw, pn, pa, d, v):
            on = iota < d
            nodes = jnp.where(on, pn, 0)
            acs = jnp.where(on, pa, 0)
            pv = pv.at[nodes, acs].add(on.astype(jnp.int32))
            pw = pw.at[nodes, acs].add(jnp.where(on, v, 0.0))
            return pv, pw

        def body(i, c):
            v, w = c
            v, w = jax.vmap(one)(
                v, w, path_n, path_a, depth,
                jnp.full((b,), 1.0) + w[:, 0, 0]
            )
            return v, w

        v, w = lax.fori_loop(0, sims, body, (visit0, wsum0))
        return jnp.sum(w[:, 0])

    report("backup scatter-add", timed(backup_loop, visit0, wsum0))


if __name__ == "__main__":
    main()
