from outgridvit_tpu.data.pipeline import ArrayDataLoader, Prefetcher  # noqa: F401
from outgridvit_tpu.data.registry import build_dataloaders  # noqa: F401
