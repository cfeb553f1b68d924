"""Model construction from a YAML-style config dict.

Accepts the exact reference YAML schema (`scripts/train.py:33-60`), including
the model.type aliases.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import jax.numpy as jnp

from outgridvit_tpu.models.model_a import MaxOutNet
from outgridvit_tpu.models.model_b import OutlookerFrontGridNet
from outgridvit_tpu.stage_config import DownsampleConfig, build_stages

_MODEL_A_ALIASES = ("a", "model_a", "maxout", "outgrid")
_MODEL_B_ALIASES = ("b", "model_b", "outlooker_front", "front")


def build_model(
    model_cfg: Mapping[str, Any],
    dtype: jnp.dtype = jnp.float32,
    use_pallas: Optional[bool] = None,
):
    """Build a model module from a config dict. Returns the Flax module.

    ``model.use_pallas`` in the YAML overrides the ``use_pallas`` argument
    (None = backend default; false = XLA-only portable path; kernel-mode
    strings like "fused_agg" are passed through to the blocks)."""
    if "use_pallas" in model_cfg:
        use_pallas = model_cfg["use_pallas"]
    # per-block remat: model.remat YAML key > OUTGRIDVIT_REMAT env > off
    from outgridvit_tpu.models.rematerialize import env_remat

    if "remat" in model_cfg:
        # An explicit YAML key always wins over the ambient env var: a falsy
        # value (remat: false / '' / 0 / null) becomes the truthy 'off'
        # sentinel so the models' trace-time env_remat() fallback cannot
        # re-enable it (models/rematerialize.py).
        v = model_cfg["remat"]
        remat = str(v) if v else "off"
    else:
        remat = env_remat()
        remat = str(remat) if remat else None
    model_type = str(model_cfg.get("type", "model_a")).lower()
    stages = tuple(build_stages(model_cfg.get("stages", [])))
    down_cfg = DownsampleConfig.from_dict(model_cfg.get("downsample", {}) or {})

    common = dict(
        num_classes=int(model_cfg.get("num_classes", 100)),
        stages=stages,
        in_ch=int(model_cfg.get("in_ch", 3)),
        stem_dim=int(model_cfg.get("stem_dim", 64)),
        dpr_max=float(model_cfg.get("dpr_max", 0.1)),
        down_cfg=down_cfg,
        dtype=dtype,
        use_pallas=use_pallas,
        remat=remat,
    )

    if model_type in _MODEL_A_ALIASES:
        return MaxOutNet(**common)
    if model_type in _MODEL_B_ALIASES:
        return OutlookerFrontGridNet(
            outlooker_front_depth=int(model_cfg.get("outlooker_front_depth", 2)),
            **common,
        )
    raise ValueError(
        f"Unknown model.type '{model_type}'. Use 'model_a' (MaxOutNet) or "
        f"'model_b' (OutlookerFrontGridNet)"
    )
