"""AZ-style actor-learner training loop (BASELINE config[4] slice).

Batched net-guided self-play feeds an on-device replay buffer; the learner
samples uniformly and applies AZ loss updates.  Everything per-iteration is
jitted; with multiple devices the env batch shards over the mesh's env axis
and parameters ride the model axis (GSPMD inserts the collectives).

Example (CPU smoke): python train.py --board 5 --envs 16 --channels 16 \
    --blocks 1 --rollout-steps 16 --iters 3 --cpu
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--board", type=int, default=9)
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--rollout-steps", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--train-batch", type=int, default=1024)
    ap.add_argument("--replay-capacity", type=int, default=1 << 16)
    ap.add_argument("--komi", type=float, default=0.0)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--mcts-sims", type=int, default=0,
                    help=">0: full MCTS self-play with this simulation budget "
                         "per move; targets = visit-count policies")
    ap.add_argument("--mcts-par", type=int, default=1,
                    help="leaf-parallel MCTS wave size (batched virtual "
                         "loss); must divide --mcts-sims")
    ap.add_argument("--mcts-reuse", nargs="?", const="root", default="",
                    choices=["root", "subtree"],
                    help="reuse the played root child's search statistics "
                         "across plies (tree reuse)")
    ap.add_argument("--gumbel-sims", type=int, default=0,
                    help=">0: Gumbel MCTS (sequential halving) self-play with "
                         "this simulation budget; targets = completed-Q "
                         "improved policies")
    ap.add_argument("--gumbel-m", type=int, default=16,
                    help="max root actions considered by sequential halving")
    ap.add_argument("--search-k", type=int, default=8,
                    help=">0: one-ply Gumbel lookahead self-play with this "
                         "many sampled actions; targets = improved policies. "
                         "0 disables search: the policy then trains on its "
                         "OWN softmax — no improvement operator — and "
                         "collapses toward always-pass (kept as the cheap "
                         "data-generation baseline, not for real training)")
    ap.add_argument("--pass-min-stones", type=int, default=-1,
                    help="forbid pass in self-play while the board holds "
                         "fewer stones than this and another legal move "
                         "exists (cold-start fix: nets bootstrapped from "
                         "ultra-short mutual-pass games learn pass-when-"
                         "ahead, which loses tempo vs any opponent that "
                         "keeps playing). -1 = auto (board_size^2 // 2); "
                         "0 disables")
    ap.add_argument("--value-bootstrap", action="store_true",
                    help="truncated-window value targets bootstrap from a "
                         "FROZEN target network's value head at the "
                         "window-final states instead of the area-sign of "
                         "the half-played board (which is stone-count noise "
                         "at 13x13+ where a window covers a fraction of one "
                         "game).  The target net is a hard copy of the "
                         "online params refreshed every --target-update "
                         "iters — bootstrapping from the ONLINE net is "
                         "measured-harmful (value head collapses to a "
                         "constant when most windows lack game ends, "
                         "BENCHMARKS.md) and train.py no longer exposes it")
    ap.add_argument("--target-update", type=int, default=8,
                    help="iterations between hard online->target copies for "
                         "--value-bootstrap's frozen target network")
    ap.add_argument("--value-grounded-only", action="store_true",
                    help="truncated-tail rows train the POLICY only: their "
                         "value targets are excluded from the loss instead "
                         "of estimated (area-sign or bootstrap).  The "
                         "measured-sound choice when windows cover a small "
                         "fraction of a game: even the frozen-target "
                         "bootstrap drifts to a constant value head over "
                         "hundreds of 19x19 iterations (BENCHMARKS.md "
                         "round-3 postmortem); with this flag the value "
                         "head sees only real +-1 outcomes")
    ap.add_argument("--reinit-value-head", action="store_true",
                    help="with --resume: replace the value-head parameters "
                         "(Conv_2/Dense_1/Dense_2) with a fresh init and "
                         "zero their Adam moments, keeping the trunk and "
                         "policy head.  The recovery move for a collapsed "
                         "value head (BENCHMARKS.md 19x19 postmortem): the "
                         "policy trunk is good, the head is the casualty — "
                         "a fresh head regresses real outcomes far faster "
                         "than a saturated-constant one un-collapses")
    ap.add_argument("--snapshot-every", type=int, default=0,
                    help=">0: with --checkpoint PATH.npz, also save immutable "
                         "snapshots PATH_iterK.npz every K iterations (Elo "
                         "ladder / head-to-head inputs)")
    ap.add_argument("--augment", action="store_true",
                    help="random dihedral symmetry augmentation of replay data")
    ap.add_argument("--eval-every", type=int, default=0,
                    help=">0: every K iters, match the current net (one-ply "
                         "search) against uniform random and log win rate")
    ap.add_argument("--eval-games", type=int, default=64)
    ap.add_argument("--eval-sims", type=int, default=0,
                    help=">0: evaluate with full Gumbel MCTS at this many "
                         "simulations instead of the one-ply k=8 lookahead")
    ap.add_argument("--eval-raw-pass", action="store_true",
                    help="evaluate WITHOUT the pass-to-win match rule "
                         "(rl.evaluate.with_pass_to_win). Self-play nets "
                         "pass 'when ahead' — correct vs themselves, tempo "
                         "suicide vs opponents who keep playing — so raw "
                         "winrates mostly measure pass etiquette, not "
                         "strength")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help=">0: also save the checkpoint every K iterations "
                         "(fault-tolerance; resume with --resume)")
    ap.add_argument("--resume", default="",
                    help="checkpoint path to resume from (bit-exact "
                         "continuation: params, optimizer, replay, env "
                         "states, RNG and iteration counter all restore)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import os

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: the 19x19 Gumbel scan costs minutes of
    # XLA:TPU compile; identical (shape, config) reruns — resumes, recipe
    # sweeps, the common case — then load from disk in seconds.  Opt out
    # with GYMGO_COMPILE_CACHE=0 or point it elsewhere with a path.
    cache = os.environ.get("GYMGO_COMPILE_CACHE", "~/.cache/gymgo_jax")
    if cache not in ("0", ""):
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser(cache)
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    from gymgo_tpu.config import EnvConfig
    from gymgo_tpu.core.state import batch_init_state
    from gymgo_tpu.models import AZNet, AZNetConfig, init_params
    from gymgo_tpu.rl import (
        ReplayBuffer,
        make_train_state,
        selfplay_rollout,
        train_step,
    )
    from gymgo_tpu.rl.selfplay import (
        augment_symmetries,
        selfplay_gumbel_rollout,
        selfplay_mcts_rollout,
        selfplay_search_rollout,
    )
    from gymgo_tpu.utils.profiling import Meter

    env_cfg = EnvConfig(
        board_size=args.board,
        batch_size=args.envs,
        komi=args.komi,
        auto_reset=True,
    )
    net_cfg = AZNetConfig(
        board_size=args.board, channels=args.channels, blocks=args.blocks
    )
    net = AZNet(net_cfg)
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    params = init_params(init_key, net_cfg)
    train_state, tx = make_train_state(params, learning_rate=args.lr)
    buf = ReplayBuffer(args.replay_capacity, args.board)
    buf_state = buf.init()

    pass_min = (
        args.board * args.board // 2
        if args.pass_min_stones < 0 else args.pass_min_stones
    )

    @jax.jit
    def selfplay_iter(key, states, params, target_params):
        vb = dict(value_bootstrap=args.value_bootstrap,
                  target_params=target_params)
        if args.gumbel_sims > 0:
            final, batch = selfplay_gumbel_rollout(
                key, states, params, net.apply, args.rollout_steps, env_cfg,
                num_simulations=args.gumbel_sims,
                max_considered=args.gumbel_m,
                pass_min_stones=pass_min, **vb,
            )
        elif args.mcts_sims > 0:
            final, batch = selfplay_mcts_rollout(
                key, states, params, net.apply, args.rollout_steps, env_cfg,
                num_simulations=args.mcts_sims,
                num_parallel=args.mcts_par,
                tree_reuse=args.mcts_reuse or False,
                pass_min_stones=pass_min, **vb,
            )
        elif args.search_k > 0:
            final, batch = selfplay_search_rollout(
                key, states, params, net.apply, args.rollout_steps, env_cfg,
                num_sampled=args.search_k,
                pass_min_stones=pass_min, **vb,
            )
        else:
            final, batch = selfplay_rollout(
                key, states, params, net.apply, args.rollout_steps, env_cfg,
                temperature=args.temperature,
                pass_min_stones=pass_min, **vb,
            )
        t, b = batch.value_target.shape
        flat_obs = batch.obs.reshape(t * b, *batch.obs.shape[2:])
        flat_pi = batch.policy_target.reshape(t * b, -1)
        # the stored per-row mask already gates both loss terms (az_loss);
        # rows keep their raw targets so replay stays self-describing
        flat_v = batch.value_target.reshape(t * b)
        # Diagnostic: fraction of rows whose game ENDS inside the window
        # (grounded +-1 value targets).  The complement is the truncated
        # tail — under --value-bootstrap those rows' targets are the frozen
        # target net's predictions, which the online net matches almost for
        # free, so TOTAL v-loss stops signalling collapse; this number says
        # how much of the v-loss is real.
        grounded = batch.grounded
        live = batch.mask
        gfrac = (
            jnp.sum((grounded & live).astype(jnp.float32))
            / jnp.maximum(jnp.sum(live.astype(jnp.float32)), 1.0)
        )
        flat_vmask = (
            (grounded & batch.mask).reshape(t * b)
            if args.value_grounded_only else batch.mask.reshape(t * b)
        )
        return (final, flat_obs, flat_pi, flat_v,
                batch.mask.reshape(t * b), flat_vmask, gfrac)

    @jax.jit
    def learn_iter(train_state, buf_state, key):
        obs, pi, v, mask, vmask = buf.sample(buf_state, key, args.train_batch)
        return train_step(train_state, tx, net.apply,
                          (obs, pi, v, mask, vmask))

    from gymgo_tpu.core.actions import uniform_random_actions
    from gymgo_tpu.rl import (
        make_gumbel_mcts_policy, make_search_policy, play_match,
        with_pass_to_win,
    )

    @jax.jit
    def eval_match(key, params):
        # With the pass-to-win wrapper, suppress pass INSIDE the search so
        # its own ranking picks the best board move; the wrapper then only
        # ever ADDS the game-sealing pass (policy-aware, zero tempi ceded).
        no_pass = 0 if args.eval_raw_pass else 1 << 20
        if args.eval_sims > 0:
            policy = make_gumbel_mcts_policy(
                params, net.apply, num_simulations=args.eval_sims,
                max_considered=args.gumbel_m, komi=args.komi,
                pass_min_stones=no_pass,
            )
        else:
            policy = make_search_policy(params, net.apply, num_sampled=8,
                                        komi=args.komi,
                                        pass_min_stones=no_pass)
        if not args.eval_raw_pass:
            policy = with_pass_to_win(policy, komi=args.komi)
        return play_match(
            key, policy, uniform_random_actions, env_cfg,
            num_games=args.eval_games,
            max_steps=3 * args.board * args.board,
        )

    from gymgo_tpu.utils import checkpoint as ckpt

    if (args.checkpoint_every or args.snapshot_every) and not args.checkpoint:
        print("warning: --checkpoint-every/--snapshot-every have no effect "
              "without --checkpoint", flush=True)

    states = batch_init_state(args.envs, args.board)
    start_iter = 0
    # Frozen target network for --value-bootstrap: a hard copy of the
    # online params, refreshed every --target-update iterations.  Kept
    # even when bootstrap is off so the checkpoint tree has one shape.
    target_params = params

    def ckpt_tree():
        return {
            "params": train_state.params,
            "opt_state": train_state.opt_state,
            "step": train_state.step,
            "buf": buf_state,
            "env_states": states,
            "key": key,
            "iteration": jnp.asarray(start_iter),
            "target_params": target_params,
        }

    if args.resume:
        import numpy as np

        tmpl = ckpt_tree()
        raw = np.load(args.resume)
        # Checkpoints written before the frozen-target change lack the
        # target_params entry; resume them with target := online params.
        if not any(k.startswith("target_params::") for k in raw.files):
            tmpl.pop("target_params")
        # Checkpoints written before the vmask column (7-leaf ReplayState)
        # restore through the old 6-leaf layout; vmask := mask (the old
        # semantics: every live row value-supervised).
        old_buf = int(raw["__len__buf"]) == 6
        if old_buf:
            b = tmpl["buf"]
            tmpl["buf"] = (b.obs, b.policy, b.value, b.mask, b.cursor,
                           b.filled)
        data = ckpt.restore_npz(args.resume, tmpl)
        train_state = train_state._replace(
            params=data["params"], opt_state=data["opt_state"],
            step=jnp.asarray(data["step"]),
        )
        if old_buf:
            o, p, v, m, cur, fil = data["buf"]
            from gymgo_tpu.rl.replay import ReplayState
            buf_state = ReplayState(obs=o, policy=p, value=v, mask=m,
                                    vmask=m, cursor=cur, filled=fil)
        else:
            buf_state = data["buf"]
        resumed_states = jnp.asarray(data["env_states"])
        if resumed_states.shape == states.shape:
            states = resumed_states
        else:
            # Resuming with a different --envs (e.g. moving to the measured
            # search-optimum batch): params/optimizer/replay carry over,
            # env populations restart from empty boards.
            print(f"note: --envs {args.envs} != checkpoint "
                  f"{resumed_states.shape[0]}; env states reset fresh",
                  flush=True)
        key = jnp.asarray(data["key"])
        start_iter = int(data["iteration"])
        target_params = data.get("target_params", train_state.params)
        print(f"resumed from {args.resume} at iteration {start_iter}", flush=True)

    if args.reinit_value_head:
        if not args.resume:
            print("warning: --reinit-value-head without --resume is a no-op "
                  "(params are already fresh)", flush=True)
        else:
            from gymgo_tpu.models.surgery import (
                reinit_value_head, zero_moments_for,
            )

            key, rv_key = jax.random.split(key)
            new_params = reinit_value_head(
                train_state.params, rv_key, net_cfg)
            new_opt = zero_moments_for(
                train_state.opt_state, train_state.params)
            train_state = train_state._replace(
                params=new_params, opt_state=new_opt)
            target_params = new_params
            print("value head re-initialized (fresh Conv_2/Dense_1/Dense_2, "
                  "Adam moments zeroed)", flush=True)

    def save(it_done, main=True):
        nonlocal start_iter
        start_iter = it_done
        if main:
            ckpt.save_npz(args.checkpoint, ckpt_tree())
        if args.snapshot_every and it_done % args.snapshot_every == 0:
            base = args.checkpoint
            stem = base[:-4] if base.endswith(".npz") else base
            ckpt.save_npz(f"{stem}_iter{it_done}.npz", ckpt_tree())

    meter = Meter()
    for it in range(start_iter, args.iters):
        if args.value_bootstrap and it % max(args.target_update, 1) == 0:
            target_params = train_state.params
        key, sp_key, lr_key = jax.random.split(key, 3)
        states, obs, pi, v, mask, vmask, gfrac = selfplay_iter(
            sp_key, states, train_state.params, target_params)
        if args.augment:
            key, aug_key = jax.random.split(key)
            obs, pi = jax.jit(augment_symmetries)(aug_key, obs, pi)
        buf_state = jax.jit(buf.add)(buf_state, obs, pi, v, mask, vmask)
        train_state, metrics = learn_iter(train_state, buf_state, lr_key)
        sps = meter.update(args.envs * args.rollout_steps)
        print(
            f"iter {it}: loss={float(metrics['loss']):.4f} "
            f"pi={float(metrics['policy_loss']):.4f} "
            f"v={float(metrics['value_loss']):.4f} "
            f"grounded={float(gfrac):.2f} "
            f"replay={int(buf_state.filled)} env-steps/s={sps:,.0f}",
            flush=True,
        )
        if args.eval_every and (it + 1) % args.eval_every == 0:
            key, ev_key = jax.random.split(key)
            res = eval_match(ev_key, train_state.params)
            extra = ""
            if int(res.unfinished):
                extra = (f", area-adjudicated="
                         f"{float(res.a_scored_winrate):.2f}")
            print(
                f"  eval vs random: winrate={float(res.a_winrate):.2f} "
                f"({int(res.policy_a_wins)}W/{int(res.policy_b_wins)}L/"
                f"{int(res.ties)}T, {int(res.unfinished)} unfinished"
                f"{extra})",
                flush=True,
            )
        due = lambda every: every and (it + 1) % every == 0
        if args.checkpoint and (
            due(args.checkpoint_every) or due(args.snapshot_every)
        ):
            # the main checkpoint rewrites only on its own cadence —
            # snapshot-only iterations just add the immutable snapshot
            save(it + 1, main=bool(due(args.checkpoint_every)))
            print(f"  checkpoint saved at iteration {it + 1}", flush=True)

    if args.checkpoint:
        save(args.iters)
        print(f"saved checkpoint to {args.checkpoint}")


if __name__ == "__main__":
    main()
