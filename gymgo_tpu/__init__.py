"""gymgo_tpu — a TPU-native, JAX/XLA/Pallas-based Go environment framework.

A from-scratch rebuild of the capabilities of huangeddie/GymGo (a
numpy/scipy Gym environment) designed for TPU hardware: the 6-channel board
state is a batched int8 array stepped in lockstep under ``jit`` across
thousands of games, with label-free fixpoint flood-fills replacing
``scipy.ndimage`` group labeling, fully on-device invalid-move masks
(ko + suicide) and Trump-Taylor scoring, and env batches sharded over a
``jax.sharding.Mesh`` for multi-host scaling.

Public surface:
  * ``gymgo_tpu.gogame`` / ``gymgo_tpu.govars`` — the reference-compatible
    low-level functional API (numpy in/out).
  * ``gymgo_tpu.env.GoEnv`` — classic-Gym-compatible single env adapter.
  * ``gymgo_tpu.env.BatchGoEnv`` — the batched, jitted product API.
  * ``gymgo_tpu.core`` — pure-JAX batched kernels (jnp in/out).
"""

from gymgo_tpu import govars
from gymgo_tpu.config import EnvConfig

__version__ = "0.1.0"


def _register_gym_envs():
    """Register go-v0 / go-extrahard-v0 with gymnasium, mirroring the
    reference's registration (/root/reference/gym_go/__init__.py:1-10)."""
    try:
        from gymnasium.envs.registration import register, registry
    except Exception:  # pragma: no cover - gymnasium is optional
        return
    if "go-v0" not in registry:
        register(id="go-v0", entry_point="gymgo_tpu.env:GoEnv")
    if "go-extrahard-v0" not in registry:
        register(id="go-extrahard-v0", entry_point="gymgo_tpu.env:GoExtraHardEnv")


_register_gym_envs()
