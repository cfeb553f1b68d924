"""Tiny-model forward tests (mirrors reference `tests/test_models.py:58-84`).

init/apply run under ``jax.jit``: on the 1-vCPU test box an eager forward
dispatches thousands of tiny ops (~10s per model), while the jitted program
is served from the persistent compilation cache on re-runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outgridvit_tpu.models import MaxOutNet, OutlookerFrontGridNet, build_model
from outgridvit_tpu.stage_config import DownsampleConfig, StageCfg


def tiny_stages():
    return (
        StageCfg(dim=8, depth=1, num_heads=2, grid_size=2, outlook_heads=2,
                 outlook_kernel=3, mlp_ratio=2.0, mbconv_expand_ratio=2.0),
        StageCfg(dim=16, depth=1, num_heads=2, grid_size=2, outlook_heads=2,
                 outlook_kernel=3, mlp_ratio=2.0, mbconv_expand_ratio=2.0),
    )


def test_model_a_forward():
    model = MaxOutNet(num_classes=10, stages=tiny_stages(), stem_dim=8,
                      dpr_max=0.1, use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    logits = jax.jit(model.apply)(variables, x)
    assert logits.shape == (2, 10)
    assert bool(jnp.isfinite(logits).all())


def test_model_b_forward():
    model = OutlookerFrontGridNet(
        num_classes=10, stages=tiny_stages(), stem_dim=8,
        outlooker_front_depth=2, dpr_max=0.1, use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    logits = jax.jit(model.apply)(variables, x)
    assert logits.shape == (2, 10)
    assert bool(jnp.isfinite(logits).all())


def test_model_a_train_mode_updates_batch_stats():
    model = MaxOutNet(num_classes=10, stages=tiny_stages(), stem_dim=8,
                      use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    train_apply = jax.jit(lambda v, x, r1, r2: model.apply(
        v, x, train=True, rngs={"dropout": r1, "droppath": r2},
        mutable=["batch_stats"]))
    logits, mutated = train_apply(variables, x, jax.random.PRNGKey(2),
                                  jax.random.PRNGKey(3))
    assert logits.shape == (2, 10)
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_ablation_heads_zero_skips_branches():
    # num_heads=0 / outlook_heads=0 / use_mbconv=False are first-class
    # (reference needed hacked blocks for its ablation notebooks, SURVEY §2.6)
    for kw in (dict(num_heads=0), dict(outlook_heads=0), dict(use_mbconv=False)):
        stages = tuple(
            s.replace(**kw) for s in tiny_stages()
        )
        model = MaxOutNet(num_classes=10, stages=stages, stem_dim=8,
                          use_pallas=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(1), x)
        logits = jax.jit(model.apply)(variables, x)
        assert logits.shape == (2, 10)
        assert bool(jnp.isfinite(logits).all())


def test_build_model_from_config_dict():
    cfg = {
        "type": "model_a",
        "num_classes": 10,
        "stem_dim": 8,
        "dpr_max": 0.05,
        "stages": [
            {"dim": 8, "depth": 1, "num_heads": 2, "grid_size": 2,
             "outlook_heads": 2},
        ],
    }
    model = build_model(cfg, use_pallas=False)
    x = jnp.zeros((1, 8, 8, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    assert jax.jit(model.apply)(variables, x).shape == (1, 10)

    cfg["type"] = "model_b"
    cfg["outlooker_front_depth"] = 1
    model_b = build_model(cfg, use_pallas=False)
    variables = jax.jit(model_b.init)(jax.random.PRNGKey(0), x)
    assert jax.jit(model_b.apply)(variables, x).shape == (1, 10)

    cfg["type"] = "nope"
    with pytest.raises(ValueError):
        build_model(cfg)


def test_capture_intermediates():
    model = MaxOutNet(num_classes=10, stages=tiny_stages(), stem_dim=8,
                      use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    logits, aux = jax.jit(lambda v, x: model.apply(
        v, x, capture=True, mutable=["intermediates"]))(variables, x)
    inter = aux["intermediates"]
    flat = jax.tree_util.tree_leaves_with_path(inter)
    paths = ["/".join(str(p) for p in path) for path, _ in flat]
    assert any("outlook_logits" in p for p in paths)
    assert any("attn" in p for p in paths)
