"""Every shipped config must build a model whose parameter count matches the
PyTorch reference built from the same YAML — catches any silent architecture
drift (shape-only check via jax.eval_shape; no weights materialized)."""

import sys
from pathlib import Path

import pytest
import yaml

REFERENCE = Path("/root/reference")
torch = pytest.importorskip("torch")
if not (REFERENCE / "src").exists():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)
if str(REFERENCE) not in sys.path:
    sys.path.insert(0, str(REFERENCE))

import jax
import jax.numpy as jnp

from outgridvit_tpu.models import build_model

CONFIGS = sorted(Path(__file__).resolve().parents[1].glob("configs/*.yaml"))
CONFIGS = [c for c in CONFIGS if c.name != "smoke_synthetic.yaml"]


def _ref_model(model_cfg):
    from src.Model_A_OutGridNet import MaxOutNet as RefA
    from src.Model_B_OutGridNet import OutlookerFrontGridNet as RefB
    from src.model.downsampling import DownsampleConfig as RefDown
    from src.stage_config import StageCfg as RefStage

    stages = [RefStage(**{k: v for k, v in s.items()})
              for s in model_cfg["stages"]]
    down = RefDown(**model_cfg.get("downsample", {}))
    common = dict(
        num_classes=int(model_cfg.get("num_classes", 100)),
        stages=stages,
        in_ch=int(model_cfg.get("in_ch", 3)),
        stem_dim=int(model_cfg.get("stem_dim", 64)),
        dpr_max=float(model_cfg.get("dpr_max", 0.1)),
        down_cfg=down,
    )
    t = str(model_cfg.get("type", "model_a")).lower()
    if t in ("a", "model_a", "maxout", "outgrid"):
        return RefA(**common)
    return RefB(outlooker_front_depth=int(
        model_cfg.get("outlooker_front_depth", 2)), **common)


@pytest.mark.parametrize("cfg_path", CONFIGS, ids=lambda p: p.stem)
def test_param_count_matches_reference(cfg_path):
    cfg = yaml.safe_load(cfg_path.read_text())
    model_cfg = cfg["model"]
    img = int(cfg.get("data", {}).get("img_size", 32))

    ref = _ref_model(model_cfg)
    want = sum(p.numel() for p in ref.parameters())

    model = build_model(model_cfg, use_pallas=False)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)))
    got = sum(
        int(jnp.prod(jnp.asarray(l.shape)))
        for l in jax.tree_util.tree_leaves(shapes["params"])
    )
    assert got == want, f"{cfg_path.name}: flax {got} vs torch {want}"
