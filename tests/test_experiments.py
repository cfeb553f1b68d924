"""Analysis-subsystem tests: capture, MAD/entropy invariants, plots."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from outgridvit_tpu.data.datasets import get_synthetic_dataloaders
from outgridvit_tpu.experiments.capture import capture_attention
from outgridvit_tpu.experiments.mad_entropy import (
    compute_grid_and_outlooker_mad_entropy_by_stage,
    grid_attn_mad_entropy_for_query,
    outlooker_kernel_entropy,
    outlooker_kernel_mad_norm,
)
from outgridvit_tpu.models import MaxOutNet
from outgridvit_tpu.stage_config import StageCfg


@pytest.fixture(scope="module")
def setup():
    stages = (
        StageCfg(dim=8, depth=2, num_heads=2, grid_size=2, outlook_heads=2,
                 mlp_ratio=2.0, mbconv_expand_ratio=2.0),
        StageCfg(dim=16, depth=1, num_heads=2, grid_size=2, outlook_heads=2,
                 mlp_ratio=2.0, mbconv_expand_ratio=2.0),
    )
    model = MaxOutNet(num_classes=10, stages=stages, stem_dim=8,
                      use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3))
    # jitted: the eager init eats ~12s/run on the 1-vCPU box; the compiled
    # program comes from the persistent cache on re-runs
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    return model, variables, x


def test_capture_keys_and_shapes(setup):
    model, variables, x = setup
    caps = capture_attention(model, variables, x)
    assert (0, 0) in caps and (0, 1) in caps and (1, 0) in caps
    c00 = caps[(0, 0)]
    # outlook logits [B, Hs, Ws, heads, 9]
    assert c00["outlook_logits"].shape == (4, 8, 8, 2, 9)
    # grid attn [B*g*g, heads, N, N] with g=2, N=(8/2)^2=16
    assert c00["grid_attn"].shape == (4 * 4, 2, 16, 16)
    assert c00["grid_hw"] == (4, 4)
    assert c00["g"] == 2
    # attention rows are a distribution
    np.testing.assert_allclose(c00["grid_attn"].sum(-1), 1.0, atol=1e-5)


def test_outlooker_kernel_metrics_extremes():
    delta = np.zeros((3, 3), np.float64)
    delta[1, 1] = 1.0  # all mass at center
    assert outlooker_kernel_mad_norm(delta) == pytest.approx(0.0)
    H, Hn = outlooker_kernel_entropy(delta)
    assert Hn == pytest.approx(0.0, abs=1e-6)

    uniform = np.full((3, 3), 1 / 9)
    # uniform MAD = (4*2 + 4*1)/9 / 2 = 12/9/2 = 0.6667
    assert outlooker_kernel_mad_norm(uniform) == pytest.approx(12 / 9 / 2)
    H, Hn = outlooker_kernel_entropy(uniform)
    assert Hn == pytest.approx(1.0, abs=1e-6)


def test_grid_mad_self_attention_is_zero():
    # attention that puts all mass on the query itself -> MAD 0, Hn 0
    Hg = Wg = 4
    g = 2
    N = Hg * Wg
    attn = np.zeros((g * g, 1, N, N), np.float64)
    for q in range(N):
        attn[:, :, q, q] = 1.0
    mad, H, Hn = grid_attn_mad_entropy_for_query(attn, Hg, Wg, g, 0, 0, 0, 5)
    assert mad == pytest.approx(0.0)
    assert Hn == pytest.approx(0.0, abs=1e-6)

    # uniform attention from corner query 0: mean L1 distance * g
    attn_u = np.full((g * g, 1, N, N), 1.0 / N)
    mad_u, _, Hn_u = grid_attn_mad_entropy_for_query(attn_u, Hg, Wg, g, 0, 0, 0, 0)
    ky = np.repeat(np.arange(Hg), Wg)
    kx = np.tile(np.arange(Wg), Hg)
    want = (np.abs(ky * g) + np.abs(kx * g)).mean()
    assert mad_u == pytest.approx(want)
    assert Hn_u == pytest.approx(1.0, abs=1e-6)


def test_stage_sweep_schema(setup):
    model, variables, x = setup
    loader, _, _ = get_synthetic_dataloaders(batch_size=4, num_samples=8,
                                             img_size=8, num_classes=10, seed=0)
    rows = compute_grid_and_outlooker_mad_entropy_by_stage(
        model, variables, loader, block_idx=0, stages=(0, 1), n_images=4,
        seed=10, grid_n_q=4, out_n_xy=8)
    assert len(rows) == 2
    for r in rows:
        assert r["MAD_grid_abs_mean"] is not None
        assert r["MAD_outlook_abs_mean"] is not None
        assert 0.0 <= r["Hn_grid_mean"] <= 1.0 + 1e-6
        assert 0.0 <= r["Hn_outlook_mean"] <= 1.0 + 1e-6
        assert 0.0 <= r["MAD_outlook_mean"] <= 1.0


def test_plots_write_files(setup, tmp_path):
    model, variables, x = setup
    from outgridvit_tpu.experiments.heatmaps import (
        plot_grid_attention_random,
        plot_outlooker_locality_random,
    )

    loader, _, _ = get_synthetic_dataloaders(batch_size=4, num_samples=8,
                                             img_size=8, num_classes=10, seed=0)
    p1 = plot_outlooker_locality_random(
        model, variables, loader, n_images=2, seed=0,
        mean=(0, 0, 0), std=(1, 1, 1), out_dir=str(tmp_path))
    p2 = plot_grid_attention_random(
        model, variables, loader, n_images=2, seed=0,
        mean=(0, 0, 0), std=(1, 1, 1), out_dir=str(tmp_path))
    assert len(p1) == 2 and len(p2) == 2
    for p in p1 + p2:
        import os

        assert os.path.getsize(p) > 1000


def test_upsample_map_matches_torch_bilinear():
    """_upsample_map reproduces the reference's F.interpolate(bilinear,
    align_corners=False) exactly, including non-divisible shapes."""
    import torch
    import torch.nn.functional as F

    from outgridvit_tpu.experiments.heatmaps import _upsample_map

    rng = np.random.default_rng(0)
    for fm, out in [((4, 4), (8, 8)), ((4, 4), (9, 9)), ((3, 5), (10, 14)),
                    ((8, 8), (8, 8))]:
        m = rng.standard_normal(fm).astype(np.float32)
        got = _upsample_map(m, out)
        want = F.interpolate(torch.from_numpy(m)[None, None], size=out,
                             mode="bilinear", align_corners=False)[0, 0]
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)


def test_plots_block_sweep(setup, tmp_path):
    """block_idx='all' sweeps every captured block per stage (the
    reference plots per (stage, block) — heat_map_att_outlooker.py:209)."""
    model, variables, x = setup
    from outgridvit_tpu.experiments.heatmaps import (
        plot_grid_attention_random,
        plot_outlooker_locality_random,
    )

    loader, _, _ = get_synthetic_dataloaders(batch_size=4, num_samples=8,
                                             img_size=8, num_classes=10,
                                             seed=0)
    p1 = plot_outlooker_locality_random(
        model, variables, loader, n_images=1, seed=0,
        mean=(0, 0, 0), std=(1, 1, 1), out_dir=str(tmp_path),
        block_idx="all")
    p2 = plot_grid_attention_random(
        model, variables, loader, n_images=1, seed=0,
        mean=(0, 0, 0), std=(1, 1, 1), out_dir=str(tmp_path),
        block_idx="all")
    # stage 0 has depth 2 -> blocks 0 and 1; stage 1 depth 1 -> block 0
    assert any(p.endswith("outlooker_stage0.png") for p in p1)
    assert any(p.endswith("outlooker_stage0_block1.png") for p in p1)
    assert len(p1) == 3 and len(p2) == 3
