from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    init_distributed,
    is_main_process,
    make_mesh,
    replicated,
    shard_batch,
)
from .sharding import gpt_param_specs, place_params, replicated_specs

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "init_distributed", "is_main_process", "DATA_AXIS", "MODEL_AXIS",
           "gpt_param_specs", "place_params", "replicated_specs"]
