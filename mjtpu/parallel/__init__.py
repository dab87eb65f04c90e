"""mjtpu.parallel — device-mesh sharding for the env batch."""

from mjtpu.parallel.sharding import (
    env_sharding,
    make_mesh,
    replicate_model,
    replicated,
    shard_batch,
    sharded_step,
)
