"""Drop-in compatibility package: ``import gym_go`` backed by gymgo_tpu.

Lets code written against the reference (huangeddie/GymGo) switch engines
without edits: ``gym_go.gogame`` / ``gym_go.govars`` are the TPU-backed
facade modules, ``gym_go.envs.GoEnv`` is the adapter, and the go-v0 /
go-extrahard-v0 ids are registered with gymnasium on import (the reference
registered them with classic gym, /root/reference/gym_go/__init__.py:1-10).
"""

import gymgo_tpu  # registers go-v0 / go-extrahard-v0
from gymgo_tpu import gogame, govars  # noqa: F401
from gymgo_tpu.env import GoEnv, GoExtraHardEnv  # noqa: F401

from gym_go import envs  # noqa: F401  (gym_go.envs.GoEnv, like the reference)
