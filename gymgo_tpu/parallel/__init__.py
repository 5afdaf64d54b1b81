from gymgo_tpu.parallel.mesh import (
    make_mesh,
    env_sharding,
    replicated,
    shard_states,
    fold_env_keys,
)
from gymgo_tpu.parallel.sharded_env import ShardedGoEnv
