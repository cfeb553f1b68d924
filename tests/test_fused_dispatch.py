"""Env-gated fused-branch dispatch: module outputs must be identical math
across all three attention paths (fused branch kernel / core kernel + XLA
projections / plain XLA) and both MLP paths, sharing one param tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.models.blocks import MultiHeadSelfAttention
from outgridvit_tpu.models.layers import ChannelMLP, LayerNorm


@pytest.fixture()
def ln_params():
    C = 48
    ls = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(3), (C,))
    lb = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (C,))
    return ls, lb


def test_mhsa_three_paths_agree(monkeypatch, ln_params):
    ls, lb = ln_params
    # N=4 keeps the interpret-mode N^2 unroll cheap; N=16 kernel coverage
    # lives in test_grid_attention_pallas_t.py
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4, 48))
    m_xla = MultiHeadSelfAttention(dim=48, num_heads=2, use_pallas=False)
    m_pal = MultiHeadSelfAttention(dim=48, num_heads=2, use_pallas=True)
    v = m_xla.init(jax.random.PRNGKey(1), x)

    want = m_xla.apply(v, x, ln=(ls, lb, 1e-5))

    monkeypatch.setenv("OUTGRIDVIT_FUSED_ATTN", "0")
    with pltpu.force_tpu_interpret_mode():
        got_core = m_pal.apply(v, x, ln=(ls, lb, 1e-5))
    monkeypatch.setenv("OUTGRIDVIT_FUSED_ATTN", "1")
    with pltpu.force_tpu_interpret_mode():
        got_fused = m_pal.apply(v, x, ln=(ls, lb, 1e-5))

    np.testing.assert_allclose(np.asarray(got_core), np.asarray(want),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(got_fused), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_mlp_env_dispatch_agrees(monkeypatch, ln_params):
    ls, lb = ln_params
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 48))
    m = ChannelMLP(dim=48, mlp_ratio=2.0)  # use_pallas=None -> env decides
    v = m.init(jax.random.PRNGKey(1), x)

    monkeypatch.setenv("OUTGRIDVIT_FUSED_MLP", "0")
    want = m.apply(v, x, ln=(ls, lb, 1e-5))

    monkeypatch.setenv("OUTGRIDVIT_FUSED_MLP", "1")
    # env opt-in only matters on TPU backends; force the fused path
    m_pal = ChannelMLP(dim=48, mlp_ratio=2.0, use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        got = m_pal.apply(v, x, ln=(ls, lb, 1e-5))

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_layernorm_return_params_matches_apply(ln_params):
    ls, lb = ln_params
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 48))
    ln = LayerNorm(epsilon=1e-5)
    v = {"params": {"ln": {"scale": ls, "bias": lb}}}
    s, b = ln.apply(v, x, return_params=True)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(ls))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(lb))


def test_mlp_width_threshold_modes(monkeypatch, ln_params):
    """rN/uN modes pick the kernel family per channel width: below the
    threshold row/unfused, above it the transposed kernel (the 64px configs
    pay an XLA relayout copy at each stage-0 t-kernel boundary)."""
    import outgridvit_tpu.ops.mlp_branch_pallas as row_mod
    import outgridvit_tpu.ops.mlp_branch_pallas_t as t_mod

    ls, lb = ln_params
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 48))
    m = ChannelMLP(dim=48, mlp_ratio=2.0, use_pallas=True)
    m_xla = ChannelMLP(dim=48, mlp_ratio=2.0, use_pallas=False)
    v = m_xla.init(jax.random.PRNGKey(1), x)  # shared param tree
    monkeypatch.setenv("OUTGRIDVIT_FUSED_MLP", "0")
    want = m_xla.apply(v, x, ln=(ls, lb, 1e-5))

    calls = []
    real_row, real_t = row_mod.mlp_branch_pallas, t_mod.mlp_branch_pallas_t
    monkeypatch.setattr(row_mod, "mlp_branch_pallas",
                        lambda *a, **k: calls.append("row") or real_row(*a, **k))
    monkeypatch.setattr(t_mod, "mlp_branch_pallas_t",
                        lambda *a, **k: calls.append("t") or real_t(*a, **k))

    for mode, expect in [("r64", "row"), ("u32", "t"), ("r32", "t"),
                         ("t64", "t")]:
        monkeypatch.setenv("OUTGRIDVIT_FUSED_MLP", mode)
        calls.clear()
        with pltpu.force_tpu_interpret_mode():
            got = m.apply(v, x, ln=(ls, lb, 1e-5))
        assert calls and calls[0] == expect, (mode, calls)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=3e-5)

    # u64: C=48 <= 64 -> unfused XLA, no kernel call
    m_env = ChannelMLP(dim=48, mlp_ratio=2.0)  # env decides
    monkeypatch.setenv("OUTGRIDVIT_FUSED_MLP", "u64")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    calls.clear()
    got = m_env.apply(v, x, ln=(ls, lb, 1e-5))
    assert not calls
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_mlp_auto_mode_shape_keyed(monkeypatch, ln_params):
    """auto (default): row kernel at large-spatial narrow-C shapes, t
    elsewhere (v5e A/B: row wins 64px stage-0, t wins everything 32px)."""
    import outgridvit_tpu.ops.mlp_branch_pallas as row_mod
    import outgridvit_tpu.ops.mlp_branch_pallas_t as t_mod

    ls, lb = ln_params
    monkeypatch.delenv("OUTGRIDVIT_FUSED_MLP", raising=False)
    calls = []
    real_row, real_t = row_mod.mlp_branch_pallas, t_mod.mlp_branch_pallas_t
    monkeypatch.setattr(row_mod, "mlp_branch_pallas",
                        lambda *a, **k: calls.append("row") or real_row(*a, **k))
    monkeypatch.setattr(t_mod, "mlp_branch_pallas_t",
                        lambda *a, **k: calls.append("t") or real_t(*a, **k))

    m = ChannelMLP(dim=48, mlp_ratio=2.0, use_pallas=True)
    m_xla = ChannelMLP(dim=48, mlp_ratio=2.0, use_pallas=False)
    for shape, expect in [((1, 64, 64, 48), "row"), ((4, 8, 8, 48), "t")]:
        x = jax.random.normal(jax.random.PRNGKey(0), shape)
        v = m_xla.init(jax.random.PRNGKey(1), x)
        want = m_xla.apply(v, x, ln=(ls, lb, 1e-5))
        calls.clear()
        with pltpu.force_tpu_interpret_mode():
            got = m.apply(v, x, ln=(ls, lb, 1e-5))
        assert calls and calls[0] == expect, (shape, calls)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=3e-5)


def test_attn_xla_n_threshold_routes_to_xla(monkeypatch):
    """OUTGRIDVIT_ATTN_XLA_N=<thr> must route N >= thr grids to the plain
    XLA path (no Pallas kernel invoked) with unchanged outputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from outgridvit_tpu.models.blocks import MultiHeadSelfAttention

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 32), jnp.float32)
    m = MultiHeadSelfAttention(dim=32, num_heads=2, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(1), x)
    monkeypatch.delenv("OUTGRIDVIT_ATTN_XLA_N", raising=False)
    want = m.apply(variables, x)  # cpu backend -> XLA path already

    calls = []
    import outgridvit_tpu.ops.grid_attention_pallas as gp
    import outgridvit_tpu.ops.grid_attention_pallas_t as gt

    def boom(*a, **k):
        calls.append(1)
        raise AssertionError("pallas kernel invoked above the threshold")

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(gp, "grid_mhsa_pallas", boom)
    monkeypatch.setattr(gt, "grid_mhsa_pallas_t", boom)
    monkeypatch.setattr(gt, "grid_mhsa_pallas_th", boom)
    monkeypatch.setenv("OUTGRIDVIT_ATTN_XLA_N", "16")
    got = m.apply(variables, x)
    assert not calls
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fused_attn_n_threshold_dispatch(monkeypatch, ln_params):
    """OUTGRIDVIT_FUSED_ATTN_N=<thr>: grids of N >= thr run the fused
    branch kernel, N < thr keep the core-kernel path; same math."""
    import outgridvit_tpu.ops.attn_branch_pallas as bp

    ls, lb = ln_params
    m_xla = MultiHeadSelfAttention(dim=48, num_heads=2, use_pallas=False)
    m_pal = MultiHeadSelfAttention(dim=48, num_heads=2, use_pallas=True)

    calls = []
    real = bp.attn_branch_pallas
    monkeypatch.setattr(
        bp, "attn_branch_pallas",
        lambda *a, **k: calls.append(1) or real(*a, **k))
    monkeypatch.delenv("OUTGRIDVIT_FUSED_ATTN", raising=False)
    monkeypatch.setenv("OUTGRIDVIT_FUSED_ATTN_N", "8")

    # N=8 >= thr: fused branch kernel
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 48))
    v = m_xla.init(jax.random.PRNGKey(1), x)
    want = m_xla.apply(v, x, ln=(ls, lb, 1e-5))
    with pltpu.force_tpu_interpret_mode():
        got = m_pal.apply(v, x, ln=(ls, lb, 1e-5))
    assert calls
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)

    # N=4 < thr: core path, no branch kernel
    calls.clear()
    x4 = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 48))
    v4 = m_xla.init(jax.random.PRNGKey(1), x4)
    want4 = m_xla.apply(v4, x4, ln=(ls, lb, 1e-5))
    with pltpu.force_tpu_interpret_mode():
        got4 = m_pal.apply(v4, x4, ln=(ls, lb, 1e-5))
    assert not calls
    np.testing.assert_allclose(np.asarray(got4), np.asarray(want4),
                               atol=3e-5, rtol=3e-5)


def test_fused_attn_default_threshold_64(monkeypatch, ln_params):
    """Default dispatch (no env): N >= 64 grids run the fused branch
    kernel (probe-gated; trivially feasible off-TPU), N < 64 do not.
    OUTGRIDVIT_FUSED_ATTN_N=0 disables the default."""
    import outgridvit_tpu.ops.attn_branch_pallas as bp

    ls, lb = ln_params
    m_xla = MultiHeadSelfAttention(dim=48, num_heads=2, use_pallas=False)
    m_pal = MultiHeadSelfAttention(dim=48, num_heads=2, use_pallas=True)

    calls = []
    real = bp.attn_branch_pallas
    monkeypatch.setattr(
        bp, "attn_branch_pallas",
        lambda *a, **k: calls.append(1) or real(*a, **k))
    monkeypatch.delenv("OUTGRIDVIT_FUSED_ATTN", raising=False)
    monkeypatch.delenv("OUTGRIDVIT_FUSED_ATTN_N", raising=False)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 48))
    v = m_xla.init(jax.random.PRNGKey(1), x)
    want = m_xla.apply(v, x, ln=(ls, lb, 1e-5))
    with pltpu.force_tpu_interpret_mode():
        got = m_pal.apply(v, x, ln=(ls, lb, 1e-5))
    assert calls, "N=64 must take the fused branch kernel by default"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)

    # threshold=0 turns the default off
    calls.clear()
    monkeypatch.setenv("OUTGRIDVIT_FUSED_ATTN_N", "0")
    with pltpu.force_tpu_interpret_mode():
        got_off = m_pal.apply(v, x, ln=(ls, lb, 1e-5))
    assert not calls
    np.testing.assert_allclose(np.asarray(got_off), np.asarray(want),
                               atol=5e-5, rtol=5e-5)


def test_fused_attn_n_malformed_env_warns_and_uses_default(monkeypatch,
                                                           ln_params):
    """A malformed OUTGRIDVIT_FUSED_ATTN_N (e.g. '64px') must warn and fall
    back to the default threshold 64 — NOT silently disable the fused
    branch (which would quietly benchmark the wrong path in an A/B)."""
    import outgridvit_tpu.ops.attn_branch_pallas as bp

    ls, lb = ln_params
    m_xla = MultiHeadSelfAttention(dim=48, num_heads=2, use_pallas=False)
    m_pal = MultiHeadSelfAttention(dim=48, num_heads=2, use_pallas=True)

    calls = []
    real = bp.attn_branch_pallas
    monkeypatch.setattr(
        bp, "attn_branch_pallas",
        lambda *a, **k: calls.append(1) or real(*a, **k))
    monkeypatch.delenv("OUTGRIDVIT_FUSED_ATTN", raising=False)
    monkeypatch.setenv("OUTGRIDVIT_FUSED_ATTN_N", "64px")

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 48))
    v = m_xla.init(jax.random.PRNGKey(1), x)
    want = m_xla.apply(v, x, ln=(ls, lb, 1e-5))
    with pytest.warns(UserWarning, match="OUTGRIDVIT_FUSED_ATTN_N"):
        with pltpu.force_tpu_interpret_mode():
            got = m_pal.apply(v, x, ln=(ls, lb, 1e-5))
    assert calls, "malformed env must keep the default N>=64 dispatch"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)
