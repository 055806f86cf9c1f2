from aqualora_tpu.core.sharding import (DATA_AXIS, MODEL_AXIS,  # noqa: F401
                                        data_sharding, is_main_process,
                                        local_batch_size, make_mesh,
                                        replicate, replicated, shard_batch)
from aqualora_tpu.parallel.partition import (  # noqa: F401
    shard_params, unet_partition_specs)
