"""Fused outlook aggregate+projection kernel (ops/experimental/outlook_agg_pallas.py)
vs its XLA twin (ops/outlook.py::outlook_aggregate_xla followed by a
dense): forward and every gradient must match to fp32-accumulate
tolerance on the shipped stage-shape families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.ops.outlook import outlook_aggregate_xla
from outgridvit_tpu.ops.experimental.outlook_agg_pallas import (
    outlook_agg_fits,
    outlook_attention_proj_pallas,
)


def _xla_twin(v, a, wp, bp, heads):
    B, H, W, C = v.shape
    a5 = a.reshape(B, H, W, heads, 9)
    y = outlook_aggregate_xla(v, a5, kernel_size=3, stride=1)
    return y @ wp + bp


def _rand(B, H, W, C, heads, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    v = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    logits = jax.random.normal(ks[1], (B, H, W, heads, 9), jnp.float32)
    a = jax.nn.softmax(logits, axis=-1).reshape(B, H, W, heads * 9)
    wp = 0.3 * jax.random.normal(ks[2], (C, C), jnp.float32)
    bp = 0.1 * jax.random.normal(ks[3], (C,), jnp.float32)
    return v, a, wp, bp


# the shipped outlooker shape families (batch shrunk): hd in {24, 32, 64},
# H == W in {4..16}, plus one non-square
@pytest.mark.parametrize("B,H,W,C,heads", [
    (2, 4, 8, 48, 2),    # 32px stage-0 family (hd=24), H != W
    (1, 8, 4, 64, 2),    # hd=32, W < H
    pytest.param(1, 16, 16, 64, 2, marks=pytest.mark.slow),  # 64px stage-0
    pytest.param(2, 4, 4, 192, 6, marks=pytest.mark.slow),   # deep stage
])
def test_fused_outlook_matches_xla_fwd_and_grads(B, H, W, C, heads):
    v, a, wp, bp = _rand(B, H, W, C, heads)
    g = jax.random.normal(jax.random.PRNGKey(9), (B, H, W, C), jnp.float32)

    want = _xla_twin(v, a, wp, bp, heads)

    def want_loss(v, a, wp, bp):
        return jnp.sum(_xla_twin(v, a, wp, bp, heads) * g)

    want_grads = jax.grad(want_loss, argnums=(0, 1, 2, 3))(v, a, wp, bp)

    def got_loss(v, a, wp, bp):
        return jnp.sum(outlook_attention_proj_pallas(v, a, wp, bp) * g)

    with pltpu.force_tpu_interpret_mode():
        got = outlook_attention_proj_pallas(v, a, wp, bp)
        got_grads = jax.grad(got_loss, argnums=(0, 1, 2, 3))(v, a, wp, bp)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    for name, gw, gg, tol in zip(
            ("dv", "da", "dwp", "dbp"), want_grads, got_grads,
            (3e-5, 3e-5, 3e-4, 3e-4)):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   atol=tol, rtol=tol, err_msg=name)


@pytest.mark.slow
def test_chunked_path_matches_whole_image(monkeypatch):
    """A tight VMEM budget forces the row-chunked kernels (halo rows +
    neighbor scatter-adds in backward); results must equal the XLA twin."""
    from outgridvit_tpu.ops.experimental.outlook_agg_pallas import _pick_bh

    B, H, W, C, heads = 2, 16, 8, 48, 2
    monkeypatch.setenv("OUTGRIDVIT_OUTAGG_KIB", "640")
    assert _pick_bh(H, W, C, heads * 9, 4) in (1, 2, 4, 8)

    v, a, wp, bp = _rand(B, H, W, C, heads, seed=3)
    g = jax.random.normal(jax.random.PRNGKey(5), (B, H, W, C), jnp.float32)
    want = _xla_twin(v, a, wp, bp, heads)

    def want_loss(v, a, wp, bp):
        return jnp.sum(_xla_twin(v, a, wp, bp, heads) * g)

    want_grads = jax.grad(want_loss, argnums=(0, 1, 2, 3))(v, a, wp, bp)

    def got_loss(v, a, wp, bp):
        return jnp.sum(outlook_attention_proj_pallas(v, a, wp, bp) * g)

    with pltpu.force_tpu_interpret_mode():
        got = outlook_attention_proj_pallas(v, a, wp, bp)
        got_grads = jax.grad(got_loss, argnums=(0, 1, 2, 3))(v, a, wp, bp)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    for name, gw, gg, tol in zip(
            ("dv", "da", "dwp", "dbp"), want_grads, got_grads,
            (3e-5, 3e-5, 3e-4, 3e-4)):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   atol=tol, rtol=tol, err_msg=name)


def test_outlook_agg_fits_guard():
    from outgridvit_tpu.ops.experimental.outlook_agg_pallas import _pick_bh

    # every shipped outlooker shape must pass the static gate at bs 128
    for H, C, heads in ((32, 48, 2), (16, 96, 3), (8, 192, 6), (4, 256, 8),
                        (64, 64, 2), (32, 128, 4), (16, 256, 8),
                        (8, 384, 6)):
        assert outlook_agg_fits(128, H, H, C, heads), (H, C, heads)
    # the fat 64px stage-0 shape must take the row-chunked path
    assert _pick_bh(64, 64, 64, 18, 2) > 0


@pytest.mark.slow
def test_module_dispatch_matches_default_path():
    """OutlookAttention2d with use_pallas="fused_agg" (forced, interpret
    mode) must match the default XLA path on the same params — forward
    AND input grads."""
    from outgridvit_tpu.models.blocks import OutlookAttention2d

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32), jnp.float32)
    ref = OutlookAttention2d(dim=48, num_heads=2, dtype=jnp.float32)
    fused = OutlookAttention2d(dim=48, num_heads=2, dtype=jnp.float32,
                               use_pallas="fused_agg")
    variables = ref.init(jax.random.PRNGKey(1), x)

    want = ref.apply(variables, x)

    def want_loss(x):
        return jnp.sum(ref.apply(variables, x) ** 2)

    want_dx = jax.grad(want_loss)(x)

    def got_loss(x):
        return jnp.sum(fused.apply(variables, x) ** 2)

    with pltpu.force_tpu_interpret_mode():
        got = fused.apply(variables, x)
        got_dx = jax.grad(got_loss)(x)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                               atol=3e-5, rtol=3e-5)


@pytest.mark.slow
def test_env_toggle_dispatches_fused_path(monkeypatch, tmp_path):
    """OUTGRIDVIT_OUTAGG=1 + tpu backend routes OutlookAttention2d through
    the fused kernel (the trace-time toggle scripts/ab_env.py flips);
    interpret mode, output must match the default path."""
    import jax

    from outgridvit_tpu.models.blocks import OutlookAttention2d

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32), jnp.float32)
    m = OutlookAttention2d(dim=48, num_heads=2, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(1), x)
    monkeypatch.delenv("OUTGRIDVIT_OUTAGG", raising=False)
    # the faked-tpu compile probe must not write an interpret-mode verdict
    # into the user's real probe cache
    import outgridvit_tpu.ops.probe_cache as pc

    monkeypatch.setenv("OUTGRIDVIT_PROBE_CACHE",
                       str(tmp_path / "probe.json"))
    monkeypatch.setattr(pc, "_PROBE_DISK", None)
    want = m.apply(variables, x)

    calls = []
    import outgridvit_tpu.ops.experimental.outlook_agg_pallas as oap

    real = oap.outlook_attention_proj_pallas
    monkeypatch.setattr(
        oap, "outlook_attention_proj_pallas",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1])
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("OUTGRIDVIT_OUTAGG", "1")
    with pltpu.force_tpu_interpret_mode():
        got = m.apply(variables, x)
    assert calls, "fused kernel was not dispatched under OUTGRIDVIT_OUTAGG=1"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def _xla_branch_twin(x, a, wv, bv, wp, bp, heads):
    B, H, W, _ = x.shape
    v = x @ wv + bv
    a5 = a.reshape(B, H, W, heads, 9)
    y = outlook_aggregate_xla(v, a5, kernel_size=3, stride=1)
    return y @ wp + bp


@pytest.mark.parametrize("B,H,W,Cin,C,heads,kib", [
    (2, 4, 8, 32, 48, 2, None),     # whole-image, Cin != C
    (1, 16, 8, 48, 48, 2, "640"),   # forced row-chunked (halo v-proj +
                                    # border-bias masking + dx scatter)
])
def test_vfold_branch_matches_xla_fwd_and_grads(B, H, W, Cin, C, heads,
                                                kib, monkeypatch):
    from outgridvit_tpu.ops.experimental.outlook_agg_pallas import (
        _pick_bh_v,
        outlook_branch_pallas,
    )

    if kib is not None:
        monkeypatch.setenv("OUTGRIDVIT_OUTAGG_KIB", kib)
        # this leg must actually exercise the row-chunked kernels
        assert _pick_bh_v(H, W, Cin, C, heads * 9, 4) > 0
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    x = jax.random.normal(ks[0], (B, H, W, Cin), jnp.float32)
    logits = jax.random.normal(ks[1], (B, H, W, heads, 9), jnp.float32)
    a = jax.nn.softmax(logits, axis=-1).reshape(B, H, W, heads * 9)
    wv = 0.3 * jax.random.normal(ks[2], (Cin, C), jnp.float32)
    bv = 0.1 * jax.random.normal(ks[3], (C,), jnp.float32)
    wp = 0.3 * jax.random.normal(ks[4], (C, C), jnp.float32)
    bp = 0.1 * jax.random.normal(ks[5], (C,), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(9), (B, H, W, C), jnp.float32)

    want = _xla_branch_twin(x, a, wv, bv, wp, bp, heads)

    def want_loss(*args):
        return jnp.sum(_xla_branch_twin(*args, heads) * g)

    want_grads = jax.grad(want_loss, argnums=tuple(range(6)))(
        x, a, wv, bv, wp, bp)

    def got_loss(*args):
        return jnp.sum(outlook_branch_pallas(*args) * g)

    with pltpu.force_tpu_interpret_mode():
        got = outlook_branch_pallas(x, a, wv, bv, wp, bp)
        got_grads = jax.grad(got_loss, argnums=tuple(range(6)))(
            x, a, wv, bv, wp, bp)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)
    for name, gw, gg, tol in zip(
            ("dx", "da", "dwv", "dbv", "dwp", "dbp"), want_grads, got_grads,
            (5e-5, 5e-5, 5e-4, 5e-4, 5e-4, 5e-4)):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   atol=tol, rtol=tol, err_msg=name)


@pytest.mark.slow
def test_vfold_module_dispatch_matches_default_path():
    """use_pallas="fused_agg_v" through OutlookAttention2d (interpret mode)
    must match the default XLA path — forward and input grads — with
    qkv_bias on (the bias must NOT leak through zero border halos)."""
    from outgridvit_tpu.models.blocks import OutlookAttention2d

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32), jnp.float32)
    ref = OutlookAttention2d(dim=48, num_heads=2, dtype=jnp.float32)
    fused = OutlookAttention2d(dim=48, num_heads=2, dtype=jnp.float32,
                               use_pallas="fused_agg_v")
    variables = ref.init(jax.random.PRNGKey(1), x)

    want = ref.apply(variables, x)

    def want_loss(x):
        return jnp.sum(ref.apply(variables, x) ** 2)

    want_dx = jax.grad(want_loss)(x)

    def got_loss(x):
        return jnp.sum(fused.apply(variables, x) ** 2)

    with pltpu.force_tpu_interpret_mode():
        got = fused.apply(variables, x)
        got_dx = jax.grad(got_loss)(x)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                               atol=3e-5, rtol=3e-5)
