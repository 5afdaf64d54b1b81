"""Interactive demo: human vs uniform-random AI.

CLI parity with the reference's demo.py (--boardsize, --komi), plus a
--render flag: 'human' opens the pyglet GUI (as the reference does);
'terminal' plays in the console for headless machines.
"""

import argparse

import numpy as np

from gymgo_tpu.env import GoEnv

parser = argparse.ArgumentParser(description="Demo Go Environment")
parser.add_argument("--boardsize", type=int, default=7)
parser.add_argument("--komi", type=float, default=0)
parser.add_argument("--render", choices=["human", "terminal"], default="terminal")
parser.add_argument("--ai", choices=["random", "net"], default="random")
parser.add_argument("--checkpoint", default="", help="npz checkpoint for --ai net")
parser.add_argument("--channels", type=int, default=64)
parser.add_argument("--blocks", type=int, default=3)
parser.add_argument("--sgf", default="", help="save the game record here")
args = parser.parse_args()

go_env = GoEnv(size=args.boardsize, komi=args.komi)
go_env.reset()
move_log = []


def make_net_ai():
    import jax
    import jax.numpy as jnp
    from gymgo_tpu.models import AZNet, AZNetConfig, init_params
    from gymgo_tpu.rl import gumbel_oneply
    from gymgo_tpu.utils import checkpoint as ckpt

    cfg = AZNetConfig(board_size=args.boardsize, channels=args.channels,
                      blocks=args.blocks)
    net = AZNet(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    if args.checkpoint:
        params = ckpt.restore_npz(args.checkpoint, {"params": params})["params"]
    key = jax.random.PRNGKey(np.random.randint(1 << 30))

    from gymgo_tpu.rl import with_pass_to_win

    # pass_min_stones pushes the inner search off non-winning passes, so
    # when the wrapper vetoes a pass the replacement is the search's own
    # best board move rather than a uniform-random fallback (the pattern
    # with_pass_to_win's docstring recommends; train.py's eval does this).
    policy = with_pass_to_win(
        lambda k, states: gumbel_oneply(
            k, states, params, net.apply, num_sampled=16, komi=args.komi,
            pass_min_stones=1 << 20,
        ).actions,
        komi=args.komi,
    )

    def pick(env):
        nonlocal key
        key, sub = jax.random.split(key)
        states = jnp.asarray(env.state(), jnp.int8)[None]
        return int(policy(sub, states)[0])

    return pick


ai_action = make_net_ai() if args.ai == "net" else (
    lambda env: env.uniform_random_action())


def terminal_action(env):
    env.render("terminal")
    while True:
        raw = input("move (row,col | p=pass | e=exit): ").strip().lower()
        if raw in ("e", "exit"):
            return -1
        if raw in ("p", "pass", ""):
            return None
        try:
            r, c = (int(x) for x in raw.replace(" ", ",").split(",") if x != "")
            if 0 <= r < env.size and 0 <= c < env.size:
                return (r, c)
        except ValueError:
            pass
        print("could not parse move, try again")


done = False
while not done:
    if args.render == "human":
        action = go_env.render(mode="human")
    else:
        action = terminal_action(go_env)
    if action == -1:
        break
    state, reward, done, info = go_env.step(action)
    move_log.append(action)

    if go_env.game_ended():
        break
    action = ai_action(go_env)
    state, reward, done, info = go_env.step(action)
    move_log.append(action)

go_env.render(mode=args.render if args.render == "human" else "terminal")
if go_env.game_ended():
    winner = go_env.winner()
    print("Result:", "black wins" if winner > 0 else ("white wins" if winner < 0 else "tie"))

if args.sgf and move_log:
    from gymgo_tpu.utils import sgf as sgf_mod

    def norm(a):
        if a is None:
            return args.boardsize ** 2
        if isinstance(a, tuple):
            return a[0] * args.boardsize + a[1]
        return int(a)

    record = sgf_mod.game_to_sgf(
        [norm(a) for a in move_log], args.boardsize, args.komi,
        result=sgf_mod.result_string(go_env.winning()) if go_env.game_ended() else None,
    )
    sgf_mod.save_sgf(args.sgf, record)
    print(f"saved SGF to {args.sgf}")
