"""Transposed-layout depthwise-conv stencil kernel (interpret mode, CPU).

ops/experimental/dwconv_pallas_t.py is opt-in (OUTGRIDVIT_DW_T=1): it measured slower
than XLA's conv lowering on v5e (see docs/PERFORMANCE.md negative results)
but is kept correct — forward, input-grad, and in-VMEM-accumulated
weight-grad all match ``lax.conv_general_dilated``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.ops.experimental.dwconv_pallas_t import dwconv3x3_t


def _ref(x, w):
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.reshape(3, 3, 1, C).astype(jnp.float32),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C).astype(x.dtype)


@pytest.mark.parametrize("B,H,W,C", [(4, 8, 8, 16), (2, 4, 4, 32)])
def test_dwconv_t_forward(B, H, W, C):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C)) * 0.2
    with pltpu.force_tpu_interpret_mode():
        got = dwconv3x3_t(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w)),
                               atol=1e-5, rtol=1e-5)


def test_dwconv_t_grads_multitile(monkeypatch):
    monkeypatch.setenv("OUTGRIDVIT_DW_BWD_KIB", "64")  # force lane tiles
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 16), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 16)) * 0.2

    def loss_t(x, w):
        return jnp.sum(dwconv3x3_t(x, w).astype(jnp.float32) ** 2)

    def loss_r(x, w):
        return jnp.sum(_ref(x, w).astype(jnp.float32) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_t, (0, 1))(x, w)
    g2 = jax.grad(loss_r, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               atol=1e-3, rtol=1e-4)
