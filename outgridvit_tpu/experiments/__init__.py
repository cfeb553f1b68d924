from outgridvit_tpu.experiments.capture import capture_attention  # noqa: F401
from outgridvit_tpu.experiments.mad_entropy import (  # noqa: F401
    compute_grid_and_outlooker_mad_by_stage,
    compute_grid_and_outlooker_mad_entropy_by_stage,
    print_mad_abs_by_stage_simple,
    run_mad_entropy_pipeline,
)
