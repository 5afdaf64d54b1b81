from gymgo_tpu.env.go_env import GoEnv, RewardMethod
from gymgo_tpu.env.go_extrahard_env import GoExtraHardEnv
from gymgo_tpu.env.batch_env import BatchGoEnv
