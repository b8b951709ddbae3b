from lightly_ocr_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    param_sharding_rules,
    shard_batch,
    shard_variables,
)
