"""API-surface parity stub, mirroring the reference's empty GoExtraHardEnv
(/root/reference/gym_go/envs/go_extrahard_env.py:4-5): registered but
unimplemented."""

try:
    import gymnasium as _gym
    _ENV_BASE = _gym.Env
except Exception:  # pragma: no cover
    _ENV_BASE = object


class GoExtraHardEnv(_ENV_BASE):
    metadata = {"render.modes": ["human", "terminal"]}
