from outgridvit_tpu.ops.activations import make_activation  # noqa: F401
from outgridvit_tpu.ops.grid import grid_partition, grid_unpartition  # noqa: F401
from outgridvit_tpu.ops.drop_path import drop_path  # noqa: F401
from outgridvit_tpu.ops.outlook import (  # noqa: F401
    outlook_aggregate,
    outlook_aggregate_xla,
)
from outgridvit_tpu.ops.attention import mhsa  # noqa: F401
