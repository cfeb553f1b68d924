"""Fused depthwise-3x3 backward kernel (ops/experimental/dwconv_bwd_pallas.py) vs XLA's
autodiff of the plain grouped conv: dx and dw must match to fp32-accumulate
tolerance on every shipped stage shape family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.ops.experimental.dwconv_bwd_pallas import (
    _dw_fwd_conv,
    dwconv3x3,
    dwconv3x3_bwd_fits,
)


def _ref_grads(x, w9, dy):
    def loss(x, w9):
        return jnp.sum(_dw_fwd_conv(x, w9) * dy)

    return jax.grad(loss, argnums=(0, 1))(x, w9)


@pytest.mark.parametrize("B,H,W,C", [
    (2, 8, 8, 16),      # tiny smoke
    (2, 16, 16, 24),    # C not a lane multiple
    (1, 8, 16, 8),      # H != W
])
def test_dwconv_bwd_matches_xla_autodiff(B, H, W, C):
    kx = jax.random.PRNGKey(0)
    x = jax.random.normal(kx, (B, H, W, C), jnp.float32)
    w9 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (9, C), jnp.float32)
    dy = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, C), jnp.float32)

    want_dx, want_dw = _ref_grads(x, w9, dy)

    def loss(x, w9):
        return jnp.sum(dwconv3x3(x, w9) * dy)

    with pltpu.force_tpu_interpret_mode():
        got_dx, got_dw = jax.grad(loss, argnums=(0, 1))(x, w9)

    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(want_dw),
                               atol=3e-4, rtol=3e-4)


def test_dwconv_bwd_forward_is_xla_conv():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16), jnp.float32)
    w9 = jax.random.normal(jax.random.PRNGKey(1), (9, 16), jnp.float32)
    np.testing.assert_array_equal(np.asarray(dwconv3x3(x, w9)),
                                  np.asarray(_dw_fwd_conv(x, w9)))


def test_dwconv_bwd_fits_guard():
    # shipped 64px stage-0 (B=128, 64x64, mid 256) must fit; a 224px
    # stage-0 spatial must not (falls back to XLA autodiff in the module)
    assert dwconv3x3_bwd_fits(128, 64, 64, 256)
    assert dwconv3x3_bwd_fits(128, 32, 32, 192)
    assert not dwconv3x3_bwd_fits(64, 224, 224, 256)


def test_module_dispatch_env(monkeypatch):
    """OUTGRIDVIT_DW_BWD=1 routes _DepthwiseConv3x3 through the custom-vjp
    wrapper; output (forward) equals the plain conv path exactly."""
    from outgridvit_tpu.models.layers import _DepthwiseConv3x3

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16), jnp.float32)
    m = _DepthwiseConv3x3(16)
    v = m.init(jax.random.PRNGKey(1), x)
    monkeypatch.delenv("OUTGRIDVIT_DW_BWD", raising=False)
    want = m.apply(v, x)
    monkeypatch.setenv("OUTGRIDVIT_DW_BWD", "1")
    got = m.apply(v, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
