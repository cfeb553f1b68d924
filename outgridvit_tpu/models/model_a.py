"""Model A — MaxOutNet (reference `src/Model_A_OutGridNet.py:9-67`).

Stem -> optional 1x1 proj -> stages of OutGridBlocks (global linear
stochastic-depth schedule across all blocks) -> Downsample between stages ->
BatchNorm -> global average pool -> linear classifier. NHWC throughout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from outgridvit_tpu.models.blocks import OutGridBlock
from outgridvit_tpu.models.layers import BatchNorm, ConvStem, Downsample
from outgridvit_tpu.models.rematerialize import env_remat, maybe_remat
from outgridvit_tpu.stage_config import DownsampleConfig, StageCfg, make_dpr

Dtype = jnp.dtype


class MaxOutNet(nn.Module):
    num_classes: int
    stages: Sequence[StageCfg]
    in_ch: int = 3
    stem_dim: int = 64
    dpr_max: float = 0.1
    down_cfg: DownsampleConfig = DownsampleConfig(kind="conv", act="silu", use_bn=True)
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32
    # per-block rematerialization policy name (models/rematerialize.py);
    # None = save intermediates as usual
    remat: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False,
                 deterministic: Optional[bool] = None, capture: bool = False):
        assert len(self.stages) >= 1
        if deterministic is None:
            deterministic = not train
        x = x.astype(self.dtype)

        x = ConvStem(self.stem_dim, act="silu", use_bn=True, dtype=self.dtype,
                     name="stem")(x, train=train)
        if self.stem_dim != self.stages[0].dim:
            x = nn.Dense(self.stages[0].dim, use_bias=True, dtype=self.dtype,
                         name="proj_in")(x)

        total_blocks = sum(s.depth for s in self.stages)
        dprs = make_dpr(total_blocks, self.dpr_max)
        idx = 0
        # statics (train/deterministic/capture) are argnums 2..4 with the
        # module at 0, so they must be passed positionally under remat.
        # env_remat() is a trace-time fallback so env-toggle A/B harnesses
        # (scripts/ab_env.py) can flip remat without rebuilding the model.
        block_cls = maybe_remat(OutGridBlock, self.remat or env_remat(),
                                (2, 3, 4))
        for si, scfg in enumerate(self.stages):
            for bi in range(scfg.depth):
                bcfg = scfg.replace(drop_path=dprs[idx])
                x = block_cls(
                    cfg=bcfg, use_pallas=self.use_pallas, dtype=self.dtype,
                    name=f"stages_{si}_{bi}",
                )(x, train, deterministic, capture)
                idx += 1
            if si < len(self.stages) - 1:
                x = Downsample(
                    scfg.dim, self.stages[si + 1].dim, cfg=self.down_cfg,
                    dtype=self.dtype, name=f"downs_{si}",
                )(x, train=train)

        x = BatchNorm(name="head_norm")(x, use_running_average=not train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="classifier")(x)
        return logits
