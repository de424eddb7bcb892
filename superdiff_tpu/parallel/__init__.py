from superdiff_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch,
    shard_sample, maybe_init_distributed, DATA_AXIS, MODEL_AXIS)
from superdiff_tpu.parallel.tp import (
    param_shardings, shard_params, state_shardings, shard_state)
from superdiff_tpu.parallel import fsdp
from superdiff_tpu.parallel import cp
from superdiff_tpu.parallel import ep
from superdiff_tpu.parallel import pp

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "shard_sample", "maybe_init_distributed",
           "DATA_AXIS", "MODEL_AXIS",
           "param_shardings", "shard_params", "state_shardings",
           "shard_state", "fsdp", "cp", "ep", "pp"]
