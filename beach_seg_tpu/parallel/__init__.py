from beach_seg_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    param_sharding,
    replicated,
    shard_batch,
)
