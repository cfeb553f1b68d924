"""Numeric unit tests for the core ops (mirrors the reference's test tier,
`tests/test_blocks.py:32-45`, plus unfold-equivalence checks the reference
never needed because it used F.unfold directly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outgridvit_tpu.ops.grid import grid_partition, grid_unpartition
from outgridvit_tpu.ops.outlook import outlook_aggregate_xla


def test_grid_partition_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6))
    grids, meta = grid_partition(x, 4)
    assert grids.shape == (2 * 16, 2, 2, 6)
    y = grid_unpartition(grids, meta)
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


def test_grid_partition_interleaving():
    # group (gy, gx) must hold pixels (i*g+gy, j*g+gx) — the MaxViT dilated
    # grid semantics (reference `src/model/grid_partition.py:13-17`).
    B, H, W, C, g = 1, 4, 4, 1, 2
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(B, H, W, C)
    grids, _ = grid_partition(x, g)
    # group index gy*g+gx = 1 -> (gy, gx) = (0, 1): pixels (2i, 2j+1)
    got = np.asarray(grids[1, :, :, 0])
    want = np.asarray(x[0, 0::g, 1::g, 0])
    np.testing.assert_array_equal(got, want)


def test_grid_partition_validates():
    x = jnp.zeros((1, 6, 6, 3))
    with pytest.raises(ValueError):
        grid_partition(x, 4)
    with pytest.raises(ValueError):
        grid_partition(x, 0)
    with pytest.raises(ValueError):
        grid_partition(jnp.zeros((6, 6, 3)), 2)


def _unfold_reference(v, k, stride):
    """Numpy re-implementation of F.unfold(k, pad=k//2, stride) gather
    semantics for verification."""
    B, H, W, C = v.shape
    p = k // 2
    vp = np.pad(v, ((0, 0), (p, p), (p, p), (0, 0)))
    Hs = (H + 2 * p - k) // stride + 1
    Ws = (W + 2 * p - k) // stride + 1
    out = np.zeros((B, Hs, Ws, k * k, C), dtype=v.dtype)
    for i in range(Hs):
        for j in range(Ws):
            patch = vp[:, i * stride : i * stride + k, j * stride : j * stride + k, :]
            out[:, i, j] = patch.reshape(B, k * k, C)
    return out


@pytest.mark.parametrize("k,stride,heads", [(3, 1, 2), (5, 1, 1), (3, 2, 2)])
def test_outlook_aggregate_matches_unfold(k, stride, heads):
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 8, 8, 8
    hd = C // heads
    v = rng.standard_normal((B, H, W, C)).astype(np.float32)
    p = k // 2
    Hs = (H + 2 * p - k) // stride + 1
    Ws = (W + 2 * p - k) // stride + 1
    a = rng.random((B, Hs, Ws, heads, k * k)).astype(np.float32)
    a = a / a.sum(-1, keepdims=True)

    got = np.asarray(outlook_aggregate_xla(jnp.asarray(v), jnp.asarray(a),
                                           kernel_size=k, stride=stride))

    v_unf = _unfold_reference(v, k, stride)  # [B,Hs,Ws,kk,C]
    v_unf = v_unf.reshape(B, Hs, Ws, k * k, heads, hd)
    want = np.einsum("bijkhd,bijhk->bijhd", v_unf, a).reshape(B, Hs, Ws, C)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_outlook_aggregate_validates():
    v = jnp.zeros((1, 4, 4, 4))
    a = jnp.zeros((1, 4, 4, 2, 9))
    with pytest.raises(ValueError):
        outlook_aggregate_xla(v, a, kernel_size=2)
    with pytest.raises(ValueError):
        outlook_aggregate_xla(v, a, kernel_size=3, stride=0)
    with pytest.raises(ValueError):
        outlook_aggregate_xla(v, jnp.zeros((1, 4, 4, 3, 9)), kernel_size=3)


def test_functional_mhsa_matches_module_math():
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.ops.attention import mhsa

    B, heads, N, hd = 2, 2, 8, 4
    q = jax.random.normal(jax.random.PRNGKey(0), (B, heads, N, hd))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, heads, N, hd))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, heads, N, hd))
    out, attn = mhsa(q, k, v, return_attn=True)
    assert out.shape == (B, heads, N, hd)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)
    # manual computation
    logits = np.einsum("bhnd,bhmd->bhnm", q, k) * hd**-0.5
    a = np.exp(logits - logits.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    want = np.einsum("bhnm,bhmd->bhnd", a, v)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_drop_path_semantics():
    # per-sample mask, survivors scaled by exactly 1/keep (reference
    # `Outlook_Block.py:7-22`); deterministic path is identity
    import jax
    import jax.numpy as jnp
    import numpy as np

    from outgridvit_tpu.ops.drop_path import drop_path

    x = jnp.ones((256, 2, 2, 4), jnp.float32)
    y = np.asarray(drop_path(x, 0.3, jax.random.PRNGKey(0), False))
    per_sample = y.reshape(256, -1)
    # each sample is all-zero or all-1/0.7
    assert ((per_sample == 0).all(axis=1)
            | np.isclose(per_sample, 1 / 0.7).all(axis=1)).all()
    kept = (per_sample[:, 0] != 0).mean()
    assert 0.55 < kept < 0.85
    z = drop_path(x, 0.3, jax.random.PRNGKey(0), True)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))


def test_roofline_report_and_compiled_cost():
    """MFU/roofline helper: cost analysis of a compiled program feeds a
    report; unknown device kinds (CPU here) degrade to mfu=None rather
    than inventing a peak."""
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.utils.roofline import (
        chip_peaks, compiled_cost, roofline_report)

    f = jax.jit(lambda a, b: a @ b)
    a = jnp.ones((64, 64), jnp.float32)
    flops, nbytes = compiled_cost(f, a, a)
    # CPU backends report flops; bytes may be absent on some versions
    if flops is not None:
        assert flops >= 2 * 64 * 64 * 64 * 0.5  # ballpark of 2*M*N*K
    rep = roofline_report(flops, nbytes, 1e-3)
    assert rep["step_ms"] == 1.0
    peak_f, peak_b, kind = chip_peaks()
    if peak_f is None:  # cpu test platform
        assert rep["mfu"] is None and rep["hbm_util"] is None
    # a known kind computes a bounded utilization
    rep2 = roofline_report(1e9, 1e6, 1e-3, n_chips=1)
    assert rep2["flops_per_byte"] == 1000.0


def test_bn_fold_matches_default_path(monkeypatch):
    """OUTGRIDVIT_BN_FOLD=1 (single low-precision x*g+b big-tensor pass)
    must match the default fp32-normalize BatchNorm to bf16 rounding, with
    an identical param/batch_stats tree and the same running-stat math."""
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.models.layers import BatchNorm

    x = (jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 16)) * 3 + 1
         ).astype(jnp.bfloat16)
    bn = BatchNorm()

    monkeypatch.delenv("OUTGRIDVIT_BN_FOLD", raising=False)
    v = bn.init(jax.random.PRNGKey(1), x, use_running_average=False)
    y0, m0 = bn.apply(v, x, use_running_average=False,
                      mutable=["batch_stats"])
    e0 = bn.apply(v, x, use_running_average=True)

    monkeypatch.setenv("OUTGRIDVIT_BN_FOLD", "1")
    v1 = bn.init(jax.random.PRNGKey(1), x, use_running_average=False)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v)
    y1, m1 = bn.apply(v, x, use_running_average=False,
                      mutable=["batch_stats"])
    e1 = bn.apply(v, x, use_running_average=True)

    np.testing.assert_allclose(np.asarray(y1, np.float32),
                               np.asarray(y0, np.float32),
                               atol=0.05, rtol=0.05)
    np.testing.assert_allclose(np.asarray(e1, np.float32),
                               np.asarray(e0, np.float32),
                               atol=0.05, rtol=0.05)
    # running stats update with the same fp32 math (biased var, flax
    # momentum convention)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(m1["batch_stats"]["bn"][k]),
            np.asarray(m0["batch_stats"]["bn"][k]), rtol=2e-2, atol=2e-2)
