"""mjtpu.parallel — device-mesh sharding, dispatch chunking, randomization."""

from mjtpu.parallel.chunked import ChunkedStepper, chunked_step
from mjtpu.parallel.randomize import (
    model_axes,
    randomize,
    randomize_with_consts,
    randomized_step,
    sharded_randomized_step,
)
from mjtpu.parallel.sharding import (
    env_sharding,
    make_mesh,
    replicate_model,
    replicated,
    shard_batch,
    sharded_step,
)
