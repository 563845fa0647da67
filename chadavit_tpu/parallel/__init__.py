from chadavit_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_shardings,
    dino_batch_shardings,
    make_mesh,
    param_shardings,
    replicated,
    shard_dino_state,
)
