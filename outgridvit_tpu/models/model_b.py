"""Model B — OutlookerFrontGridNet (reference `src/Model_B_OutGridNet.py:11-100`).

Stem -> optional 1x1 proj -> `outlooker_front_depth` OutlookerBlocks (VOLO-like
front) -> stages of GridOnlyBlocks with Downsample between -> BN + GAP + linear.
The stochastic-depth schedule spans front + all stage blocks.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from outgridvit_tpu.models.blocks import GridOnlyBlock, OutlookerBlock2d
from outgridvit_tpu.models.layers import BatchNorm, ConvStem, Downsample
from outgridvit_tpu.models.rematerialize import env_remat, maybe_remat
from outgridvit_tpu.stage_config import DownsampleConfig, StageCfg, make_dpr

Dtype = jnp.dtype


class OutlookerFrontGridNet(nn.Module):
    num_classes: int
    stages: Sequence[StageCfg]
    in_ch: int = 3
    stem_dim: int = 64
    outlooker_front_depth: int = 2
    dpr_max: float = 0.1
    down_cfg: DownsampleConfig = DownsampleConfig(kind="conv", act="silu", use_bn=True)
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32
    # per-block rematerialization policy name (models/rematerialize.py)
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

        total_blocks = self.outlooker_front_depth + sum(s.depth for s in self.stages)
        dprs = make_dpr(total_blocks, self.dpr_max)
        idx = 0

        # env_remat() is a trace-time fallback (see model_a.py)
        remat = self.remat or env_remat()
        front_cls = maybe_remat(OutlookerBlock2d, remat, (2, 3))
        stage_cls = maybe_remat(GridOnlyBlock, remat, (2, 3, 4))

        front_cfg = self.stages[0]
        for fi in range(self.outlooker_front_depth):
            x = front_cls(
                dim=front_cfg.dim,
                num_heads=front_cfg.outlook_heads,
                kernel_size=front_cfg.outlook_kernel,
                stride=1,
                mlp_ratio=front_cfg.outlook_mlp_ratio,
                attn_drop=front_cfg.attn_drop,
                proj_drop=front_cfg.proj_drop,
                mlp_drop=front_cfg.ffn_drop,
                drop_path=dprs[idx],
                act=front_cfg.mlp_act,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"front_{fi}",
            )(x, deterministic, capture)
            idx += 1

        for si, scfg in enumerate(self.stages):
            for bi in range(scfg.depth):
                bcfg = scfg.replace(drop_path=dprs[idx])
                x = stage_cls(
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
