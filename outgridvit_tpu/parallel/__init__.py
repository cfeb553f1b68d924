from outgridvit_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_pspec,
    shard_train_state,
    superbatch_sharding,
)
from outgridvit_tpu.parallel.distributed import (  # noqa: F401
    initialize as initialize_distributed,
    is_main_process,
    local_row_slice,
    process_count,
    process_index,
    put_global,
    put_replicated_global,
    replicate_to_host,
    shard_loader_for_process,
    warmup_collectives,
)
