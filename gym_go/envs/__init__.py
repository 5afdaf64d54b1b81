from gymgo_tpu.env import GoEnv, GoExtraHardEnv  # noqa: F401
