from outgridvit_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_pspec,
    shard_train_state,
    superbatch_sharding,
)
