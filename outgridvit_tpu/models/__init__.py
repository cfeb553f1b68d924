from outgridvit_tpu.models.layers import (  # noqa: F401
    ChannelMLP,
    ConvStem,
    Downsample,
    DropPath,
    MBConv,
    SqueezeExcite,
)
from outgridvit_tpu.models.blocks import (  # noqa: F401
    GridAttention2D,
    GridOnlyBlock,
    MultiHeadSelfAttention,
    OutGridBlock,
    OutlookAttention2d,
    OutlookerBlock2d,
)
from outgridvit_tpu.models.model_a import MaxOutNet  # noqa: F401
from outgridvit_tpu.models.model_b import OutlookerFrontGridNet  # noqa: F401
from outgridvit_tpu.models.build import build_model  # noqa: F401
