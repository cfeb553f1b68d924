"""OutGridViT-TPU: a TPU-native (JAX/Flax/XLA/Pallas) vision-transformer framework.

A from-scratch rebuild of the capabilities of the reference
`pablo-reyes8/outlook-grid-vision-transformer` (OutGridViT), designed TPU-first:

- NHWC-native end to end (no NCHW<->BHWC layout round-trips; cf. reference
  `src/model/Out_Grid_Block.py:96,107` which permutes three times per block).
- Functional core: Flax Linen modules + a pure TrainState stepped by a single
  jitted train step (forward + backward + optimizer + metrics in one XLA program).
- Outlook attention as a fused Pallas TPU kernel with an XLA shift-and-accumulate
  reference path (the reference materializes a K^2-times larger unfold tensor,
  `src/model/outlook_attention.py:113`; we never do).
- bf16-by-default mixed precision (no GradScaler needed on TPU).
- Data parallel + tensor parallel over a `jax.sharding.Mesh` via jit/NamedSharding.
"""

__version__ = "0.1.0"

from outgridvit_tpu.stage_config import (  # noqa: F401
    AttentionConfig,
    DownsampleConfig,
    GridAttentionConfig,
    MBConvConfig,
    StageCfg,
)
