"""Per-block rematerialization (models/rematerialize.py) is a pure
performance knob: loss, gradients, and mutated batch_stats must be
IDENTICAL with it on or off (the policy only changes what the backward
saves vs recomputes). No reference counterpart — the reference has no
activation checkpointing (`src/training/one_epoch_train.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outgridvit_tpu.models import MaxOutNet, OutlookerFrontGridNet, build_model
from outgridvit_tpu.models.rematerialize import env_remat, remat_policy
from outgridvit_tpu.stage_config import StageCfg


def tiny_stages():
    return (
        StageCfg(dim=8, depth=1, num_heads=2, grid_size=2, outlook_heads=2,
                 outlook_kernel=3, mlp_ratio=2.0, mbconv_expand_ratio=2.0),
        StageCfg(dim=16, depth=1, num_heads=2, grid_size=2, outlook_heads=2,
                 outlook_kernel=3, mlp_ratio=2.0, mbconv_expand_ratio=2.0),
    )


def _loss_grads_stats(model, variables, x, rngs):
    def loss_fn(params):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"], rngs=rngs)
        return jnp.mean(logits ** 2), mutated["batch_stats"]

    (loss, stats), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    return loss, grads, stats


@pytest.mark.parametrize("policy", ["nothing", "dots", "dots_no_batch"])
def test_remat_model_a_identical(policy):
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3)))
    rngs = {"dropout": jax.random.PRNGKey(2),
            "droppath": jax.random.PRNGKey(3)}
    kw = dict(num_classes=10, stages=tiny_stages(), stem_dim=8,
              dpr_max=0.1, use_pallas=False)
    base = MaxOutNet(**kw)
    rem = MaxOutNet(remat=policy, **kw)
    variables = jax.jit(base.init)(jax.random.PRNGKey(1), x)
    # same param tree: remat is transparent to module structure
    l0, g0, s0 = _loss_grads_stats(base, variables, x, rngs)
    l1, g1, s1 = _loss_grads_stats(rem, variables, x, rngs)
    assert np.allclose(float(l0), float(l1), rtol=0, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        g0, g1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        s0, s1)


def test_remat_model_b_identical():
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3)))
    rngs = {"dropout": jax.random.PRNGKey(2),
            "droppath": jax.random.PRNGKey(3)}
    kw = dict(num_classes=10, stages=tiny_stages(), stem_dim=8,
              outlooker_front_depth=2, dpr_max=0.1, use_pallas=False)
    base = OutlookerFrontGridNet(**kw)
    rem = OutlookerFrontGridNet(remat="nothing", **kw)
    variables = jax.jit(base.init)(jax.random.PRNGKey(1), x)
    l0, g0, s0 = _loss_grads_stats(base, variables, x, rngs)
    l1, g1, s1 = _loss_grads_stats(rem, variables, x, rngs)
    assert np.allclose(float(l0), float(l1), rtol=0, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        g0, g1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        s0, s1)


def test_remat_yaml_and_env(monkeypatch):
    cfg = {"type": "model_a", "num_classes": 10, "stem_dim": 8,
           "stages": [{"dim": 8, "depth": 1, "num_heads": 2, "grid_size": 2,
                       "outlook_heads": 2}]}
    assert build_model(cfg).remat is None
    monkeypatch.setenv("OUTGRIDVIT_REMAT", "nothing")
    assert env_remat() == "nothing"
    assert build_model(cfg).remat == "nothing"
    # YAML key wins over env
    assert build_model({**cfg, "remat": "dots"}).remat == "dots"
    monkeypatch.setenv("OUTGRIDVIT_REMAT", "0")
    assert env_remat() is None


def _jaxpr_has_remat(model, x):
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(1), x)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    jaxpr = jax.make_jaxpr(lambda v: model.apply(v, x))(variables)
    return any(e.primitive.name == "remat2" for e in jaxpr.eqns)


def test_remat_env_applies_at_trace_time(monkeypatch):
    """A/B harnesses (scripts/ab_env.py) toggle env vars around each
    side's first trace; remat must honor OUTGRIDVIT_REMAT then, not only
    at build_model time."""
    x = jnp.zeros((1, 8, 8, 3))
    model = MaxOutNet(num_classes=10, stages=tiny_stages()[:1], stem_dim=8,
                      dpr_max=0.0, use_pallas=False)
    assert model.remat is None
    monkeypatch.delenv("OUTGRIDVIT_REMAT", raising=False)
    assert not _jaxpr_has_remat(model, x)
    monkeypatch.setenv("OUTGRIDVIT_REMAT", "dots")
    assert _jaxpr_has_remat(model, x)


def test_remat_policy_names():
    assert remat_policy("nothing") is None
    assert remat_policy("dots") is jax.checkpoint_policies.dots_saveable
    with pytest.raises(ValueError):
        remat_policy("bogus")


def test_remat_yaml_falsy_forces_off_despite_env(monkeypatch):
    """A falsy YAML remat key (remat: false / '' / 0 / null) must resolve
    to the truthy 'off' sentinel so the trace-time OUTGRIDVIT_REMAT
    fallback in the models cannot re-enable remat."""
    cfg = {"type": "model_a", "num_classes": 10, "stem_dim": 8,
           "use_pallas": False, "dpr_max": 0.0,
           "stages": [{"dim": 8, "depth": 1, "num_heads": 2, "grid_size": 2,
                       "outlook_heads": 2}]}
    monkeypatch.setenv("OUTGRIDVIT_REMAT", "dots")
    x = jnp.zeros((1, 8, 8, 3))
    # without the key, the env wins (build-time resolution)
    assert build_model(cfg).remat == "dots"
    for off_val in (False, "", 0, None):
        m = build_model({**cfg, "remat": off_val})
        assert m.remat == "off", off_val
        assert not _jaxpr_has_remat(m, x), off_val
    # the explicit string also works and an explicit policy still wins
    assert not _jaxpr_has_remat(build_model({**cfg, "remat": "off"}), x)
    assert _jaxpr_has_remat(build_model({**cfg, "remat": "nothing"}), x)
