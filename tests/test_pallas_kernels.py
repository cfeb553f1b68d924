"""Pallas-kernel vs XLA-path equivalence (interpret mode, runs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.ops.grid_attention_pallas import grid_mhsa_pallas


def _xla_ref(qkv, heads):
    Bgrp, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    q = qkv[:, :, :C].reshape(Bgrp, N, heads, hd)
    k = qkv[:, :, C : 2 * C].reshape(Bgrp, N, heads, hd)
    v = qkv[:, :, 2 * C :].reshape(Bgrp, N, heads, hd)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * (hd**-0.5)
    a = jax.nn.softmax(logits, -1)
    o = jnp.einsum("bhnm,bmhd->bnhd", a.astype(qkv.dtype), v,
                   preferred_element_type=jnp.float32)
    return o.reshape(Bgrp, N, C).astype(qkv.dtype)


@pytest.mark.parametrize("Bgrp,N,C,heads", [(64, 16, 48, 2), (32, 4, 64, 2)])
def test_grid_mhsa_pallas_matches_xla(Bgrp, N, C, heads):
    qkv = jax.random.normal(jax.random.PRNGKey(0), (Bgrp, N, 3 * C),
                            jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = grid_mhsa_pallas(qkv, heads)
    want = _xla_ref(qkv, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_grid_mhsa_pallas_grad_matches_xla():
    Bgrp, N, C, heads = 32, 16, 48, 2
    qkv = jax.random.normal(jax.random.PRNGKey(1), (Bgrp, N, 3 * C),
                            jnp.float32)

    def loss_pal(x):
        return (grid_mhsa_pallas(x, heads).astype(jnp.float32) ** 2).sum()

    def loss_ref(x):
        return (_xla_ref(x, heads).astype(jnp.float32) ** 2).sum()

    # the custom-vjp backward kernel executes during grad evaluation, so the
    # interpret context must wrap the whole grad call
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_pal)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=5e-4, rtol=5e-4)


def test_mhsa_module_pallas_param_compat():
    """The fused and XLA paths of MultiHeadSelfAttention must share params
    (checkpoints interchangeable)."""
    from outgridvit_tpu.models.blocks import MultiHeadSelfAttention

    # N=4 grids: the param-tree/path-agreement property is shape-independent
    # and the N<=16 interpret-mode kernel unrolls N^2 pairs (N=16 cost 50 s
    # of suite time here; kernel-level N=16 coverage lives in
    # test_grid_attention_pallas_t.py)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 48))
    m_xla = MultiHeadSelfAttention(dim=48, num_heads=2, use_pallas=False)
    m_pal = MultiHeadSelfAttention(dim=48, num_heads=2, use_pallas=True)
    v_xla = m_xla.init(jax.random.PRNGKey(1), x)
    with pltpu.force_tpu_interpret_mode():
        v_pal = m_pal.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(v_xla) == jax.tree_util.tree_structure(v_pal)

    with pltpu.force_tpu_interpret_mode():
        out_pal = m_pal.apply(v_xla, x)
    out_xla = m_xla.apply(v_xla, x)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("Bgrp,N,C,heads", [
    (256, 64, 64, 2),    # 64px stage-0 shape (N=64, P=1)
    (128, 16, 384, 6),   # wide-C deep-stage shape
    (64, 4, 256, 8),     # tiny-N wide-C (packs to 32 rows)
])
def test_grid_mhsa_pallas_more_shapes(Bgrp, N, C, heads):
    qkv = jax.random.normal(jax.random.PRNGKey(0), (Bgrp, N, 3 * C),
                            jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = grid_mhsa_pallas(qkv, heads)
    want = _xla_ref(qkv, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_grid_mhsa_pack_override_matches_unpacked(monkeypatch):
    """OUTGRIDVIT_ATTN_PACK packs P grids into one masked 128-row attention
    for N>=16 shapes (an A/B knob for the 64px N=64 stage). The mask must
    keep the packed result identical to the unpacked one."""
    monkeypatch.setenv("OUTGRIDVIT_ATTN_PACK", "2")
    qkv = jax.random.normal(jax.random.PRNGKey(2), (16, 64, 3 * 64),
                            jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = grid_mhsa_pallas(qkv, 2)
    want = _xla_ref(qkv, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)
