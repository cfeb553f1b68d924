"""Lane-batched tiny-grid MHSA kernel (interpret mode, CPU).

Validates ops/grid_attention_pallas_t.py — the default TPU attention core
for N<=16 token grids since the layout redesign — against the plain XLA
einsum formulation, forward and backward, across the head/channel combos
Model A/B actually use (stage 0: N=16 tokens per grid; stages 1-3: N=4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.ops.grid_attention_pallas_t import (
    grid_mhsa_pallas_t,
    grid_mhsa_pallas_th,
)


def _xla_ref(qkv, heads):
    B, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    q3 = qkv.reshape(B, N, 3, heads, hd)
    q, k, v = q3[:, :, 0], q3[:, :, 1], q3[:, :, 2]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                      preferred_element_type=jnp.float32) * hd**-0.5
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(qkv.dtype), v,
                     preferred_element_type=jnp.float32).astype(qkv.dtype)
    return out.reshape(B, N, C)


@pytest.mark.parametrize("B,N,C,heads", [
    (64, 4, 96, 3),    # stage-1 shape family
    (32, 4, 192, 6),   # stage-2
    (16, 4, 256, 8),   # stage-3
    (16, 8, 48, 2),    # N=8
    # stage-0 N=16 edge: the interpret-mode unroll is 256 pairs (~20 s on
    # a 1-vCPU box) — slow tier; the N<=8 params cover the same code path
    pytest.param(4, 16, 48, 2, marks=pytest.mark.slow),
])
def test_lane_batched_mhsa_forward(B, N, C, heads):
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C),
                            jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = grid_mhsa_pallas_t(qkv, heads)
    want = _xla_ref(qkv, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_lane_batched_mhsa_grads():
    # B=16 (not a full stage batch): the grad math is per-grid, B only
    # changes tiling — covered separately by the multitile test
    qkv = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 3 * 96),
                            jnp.float32)

    def loss_pal(x):
        return jnp.sum(grid_mhsa_pallas_t(x, 3).astype(jnp.float32) ** 2)

    def loss_ref(x):
        return jnp.sum(_xla_ref(x, 3).astype(jnp.float32) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_pal)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("B,N,C,heads", [
    (16, 4, 96, 3),    # shares the t-kernel's shape family
    # 64px stage-2 family: the shape the full-C kernel cannot fit on
    # hardware (head-chunking's raison d'être); N=16 interpret-mode unroll
    # is slow-tier, the wide-C chunking path is covered by (8,8,384,6)
    pytest.param(4, 16, 256, 8, marks=pytest.mark.slow),
    (8, 8, 384, 6),    # wide-C, head dim 64
])
def test_head_chunked_mhsa_forward(B, N, C, heads):
    qkv = jax.random.normal(jax.random.PRNGKey(3), (B, N, 3 * C),
                            jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = grid_mhsa_pallas_th(qkv, heads)
    want = _xla_ref(qkv, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_head_chunked_mhsa_grads():
    qkv = jax.random.normal(jax.random.PRNGKey(4), (16, 4, 3 * 96),
                            jnp.float32)

    def loss_pal(x):
        return jnp.sum(grid_mhsa_pallas_th(x, 3).astype(jnp.float32) ** 2)

    def loss_ref(x):
        return jnp.sum(_xla_ref(x, 3).astype(jnp.float32) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_pal)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-3, rtol=2e-3)


@pytest.mark.slow
def test_lane_batched_mhsa_multitile(monkeypatch):
    # tiny budget forces multiple lane tiles
    monkeypatch.setenv("OUTGRIDVIT_ATTN_T_FWD_KIB", "512")
    monkeypatch.setenv("OUTGRIDVIT_ATTN_T_BWD_KIB", "512")
    qkv = jax.random.normal(jax.random.PRNGKey(2), (256, 4, 3 * 96),
                            jnp.float32)

    def loss_pal(x):
        return jnp.sum(grid_mhsa_pallas_t(x, 3).astype(jnp.float32) ** 2)

    with pltpu.force_tpu_interpret_mode():
        got = grid_mhsa_pallas_t(qkv, 3)
        g1 = jax.grad(loss_pal)(qkv)
    want = _xla_ref(qkv, 3)
    g2 = jax.grad(
        lambda x: jnp.sum(_xla_ref(x, 3).astype(jnp.float32) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-3, rtol=2e-3)


def test_probe_cache_roundtrip_and_dispatch_verdicts(monkeypatch, tmp_path):
    """The compile-probe's disk cache must round-trip, and a cached verdict
    must decide `attn_kernel_feasible` without invoking the compiler —
    pinning the dispatch boundary class that OOM'd in round 2 (a336fd5)."""
    import jax

    import outgridvit_tpu.ops.grid_attention_pallas_t as gat
    import outgridvit_tpu.ops.probe_cache as pc

    monkeypatch.setenv("OUTGRIDVIT_PROBE_CACHE", str(tmp_path / "probe.json"))
    monkeypatch.setattr(pc, "_PROBE_DISK", None)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    gat.attn_kernel_feasible.cache_clear()

    # poison the cache: "t" infeasible, "th" feasible for a fake shape
    # (verdicts are keyed per device generation AND per VMEM tile budget —
    # probe_cache.cached_probe appends the device-kind tag and
    # attn_kernel_feasible appends the FWD/BWD budget KiBs, so the poison
    # must too)
    tag = pc._device_kind_tag()
    budgets = (f"{gat._env_kib('OUTGRIDVIT_ATTN_T_FWD_KIB', 10240)}:"
               f"{gat._env_kib('OUTGRIDVIT_ATTN_T_BWD_KIB', 10240)}")
    gat._probe_disk_save(f"tpu:t:4096:16:256:8:bfloat16:{budgets}:{tag}",
                         False)
    gat._probe_disk_save(f"tpu:th:4096:16:256:8:bfloat16:{budgets}:{tag}",
                         True)

    # a fresh process would re-read from disk
    monkeypatch.setattr(pc, "_PROBE_DISK", None)

    def boom(*a, **k):  # the probe must NOT compile on a disk hit
        raise AssertionError("compiled despite cached verdict")

    monkeypatch.setattr(jax, "jit", boom)
    assert gat.attn_kernel_feasible("t", 4096, 16, 256, 8) is False
    assert gat.attn_kernel_feasible("th", 4096, 16, 256, 8) is True
    gat.attn_kernel_feasible.cache_clear()
