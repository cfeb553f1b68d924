"""Fused MLP-branch kernel vs unfused composition (interpret mode, CPU).

Validates ops/mlp_branch_pallas.py — fc2(act(fc1(LN(x)))) in one kernel —
against the exact Flax composition, forward and full backward, plus the
ChannelMLP module's param-tree compatibility between paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.ops.activations import make_activation
from outgridvit_tpu.ops.mlp_branch_pallas import mlp_branch_pallas


def _ref(x, ls, lb, w1, b1, w2, b2, act, eps, apply_ln=True):
    if apply_ln:
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.maximum(0.0, jnp.mean(x32 * x32, -1, keepdims=True) - mu**2)
        x = ((x32 - mu) * (jax.lax.rsqrt(var + eps) * ls) + lb).astype(x.dtype)
    h = act(x @ w1.astype(x.dtype) + b1.astype(x.dtype))
    return h @ w2.astype(x.dtype) + b2.astype(x.dtype)


def _make(key, M, C, H, dtype):
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (M, C), dtype)
    ls = 1.0 + 0.1 * jax.random.normal(ks[1], (C,), jnp.float32)
    lb = 0.1 * jax.random.normal(ks[2], (C,), jnp.float32)
    w1 = (jax.random.normal(ks[3], (C, H), jnp.float32) * C**-0.5).astype(dtype)
    b1 = (0.02 * jax.random.normal(ks[4], (H,), jnp.float32)).astype(dtype)
    w2 = (jax.random.normal(ks[5], (H, C), jnp.float32) * H**-0.5).astype(dtype)
    b2 = (0.02 * jax.random.normal(ks[6], (C,), jnp.float32)).astype(dtype)
    return x, ls, lb, w1, b1, w2, b2


@pytest.mark.parametrize("actname", ["gelu", "silu"])
@pytest.mark.parametrize("apply_ln", [True, False])
def test_mlp_branch_forward(actname, apply_ln):
    act = make_activation(actname)
    args = _make(jax.random.PRNGKey(0), 64, 48, 96, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = mlp_branch_pallas(*args, actname, 1e-5, apply_ln)
    want = _ref(*args, act, 1e-5, apply_ln)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_mlp_branch_grads():
    act = make_activation("gelu")
    args = _make(jax.random.PRNGKey(1), 64, 48, 96, jnp.float32)
    argnums = tuple(range(7))

    def loss_pal(*a):
        return (mlp_branch_pallas(*a, "gelu", 1e-5, True)
                .astype(jnp.float32) ** 2).sum()

    def loss_ref(*a):
        return (_ref(*a, act, 1e-5, True).astype(jnp.float32) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_pal, argnums)(*args)
    g2 = jax.grad(loss_ref, argnums)(*args)
    names = ["dx", "dls", "dlb", "dw1", "db1", "dw2", "db2"]
    for n, a, b in zip(names, g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3,
            err_msg=f"gradient mismatch: {n}")


def test_mlp_branch_4d_shape():
    act = make_activation("gelu")
    x, ls, lb, w1, b1, w2, b2 = _make(jax.random.PRNGKey(2), 64, 48, 96,
                                      jnp.float32)
    x4 = x.reshape(2, 4, 8, 48)
    with pltpu.force_tpu_interpret_mode():
        got = mlp_branch_pallas(x4, ls, lb, w1, b1, w2, b2, "gelu", 1e-5, True)
    assert got.shape == x4.shape
    want = _ref(x, ls, lb, w1, b1, w2, b2, act, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got).reshape(64, 48),
                               np.asarray(want), atol=3e-5, rtol=3e-5)


def test_channel_mlp_param_compat_and_ln_fusion():
    """ChannelMLP: fused-pallas vs unfused paths share params and agree,
    including the fused pre-LN."""
    from outgridvit_tpu.models.layers import ChannelMLP, LayerNorm

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 48))
    m_xla = ChannelMLP(dim=48, mlp_ratio=2.0, use_pallas=False)
    m_pal = ChannelMLP(dim=48, mlp_ratio=2.0, use_pallas=True)
    v = m_xla.init(jax.random.PRNGKey(1), x)
    with pltpu.force_tpu_interpret_mode():
        v_pal = m_pal.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_pal))

    ln = LayerNorm(epsilon=1e-5)
    vln = ln.init(jax.random.PRNGKey(2), x)
    ls = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(3), (48,))
    lb = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (48,))
    vln = {"params": {"ln": {"scale": ls, "bias": lb}}}

    with pltpu.force_tpu_interpret_mode():
        out_pal = m_pal.apply(v, x, ln=(ls, lb, 1e-5))
    xn = ln.apply(vln, x)
    out_xla = m_xla.apply(v, xn)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla),
                               atol=3e-5, rtol=3e-5)
