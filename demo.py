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
args = parser.parse_args()

go_env = GoEnv(size=args.boardsize, komi=args.komi)
go_env.reset()


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

    if go_env.game_ended():
        break
    action = go_env.uniform_random_action()
    state, reward, done, info = go_env.step(action)

go_env.render(mode=args.render if args.render == "human" else "terminal")
if go_env.game_ended():
    winner = go_env.winner()
    print("Result:", "black wins" if winner > 0 else ("white wins" if winner < 0 else "tie"))
