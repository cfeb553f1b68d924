"""NHWC-direct fused attention branch vs partition + unfused composition.

Validates ops/attn_branch_nhwc_pallas.py — the branch kernel whose
BlockSpecs fold grid_partition/unpartition into the DMA — against
``grid_unpartition(ref_branch(grid_partition(x)))`` with the exact Flax
math, forward and full backward, on CPU via the Pallas interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.ops.experimental.attn_branch_nhwc_pallas import (
    attn_branch_nhwc_pallas,
)
from outgridvit_tpu.ops.grid import grid_partition, grid_unpartition

from tests.test_attn_branch_pallas import _make_args, _ref_branch


def _ref_nhwc(x, ls, lb, wqkv, bqkv, wproj, bproj, heads, eps, g,
              apply_ln=True):
    grids, meta = grid_partition(x, g)
    Bgrp, Hg, Wg, C = grids.shape
    tok = grids.reshape(Bgrp, Hg * Wg, C)
    out = _ref_branch(tok, ls, lb, wqkv, bqkv, wproj, bproj, heads, eps,
                      apply_ln)
    return grid_unpartition(out.reshape(Bgrp, Hg, Wg, C), meta)


def _make_nhwc_args(key, B, H, W, C, dtype):
    x, ls, lb, wqkv, bqkv, wproj, bproj = _make_args(key, B, H * W, C, dtype)
    return x.reshape(B, H, W, C), ls, lb, wqkv, bqkv, wproj, bproj


@pytest.mark.parametrize("B,H,W,C,heads,g", [
    (4, 16, 16, 64, 2, 2),   # N=64 windows (the 64px stage-0 shape family)
    (2, 8, 16, 48, 2, 4),    # rectangular, N=8
])
@pytest.mark.parametrize("apply_ln", [True, False])
def test_nhwc_branch_forward_matches_ref(B, H, W, C, heads, g, apply_ln):
    args = _make_nhwc_args(jax.random.PRNGKey(0), B, H, W, C, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = attn_branch_nhwc_pallas(*args, heads, g, 1e-5, apply_ln)
    want = _ref_nhwc(*args, heads, 1e-5, g, apply_ln)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_nhwc_branch_grads_match_ref():
    B, H, W, C, heads, g, eps = 2, 8, 8, 48, 2, 2, 1e-5
    args = _make_nhwc_args(jax.random.PRNGKey(1), B, H, W, C, jnp.float32)
    argnums = tuple(range(7))

    def loss_pal(*a):
        return (attn_branch_nhwc_pallas(*a, heads, g, eps, True)
                .astype(jnp.float32) ** 2).sum()

    def loss_ref(*a):
        return (_ref_nhwc(*a, heads, eps, g, True)
                .astype(jnp.float32) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_pal, argnums)(*args)
    g2 = jax.grad(loss_ref, argnums)(*args)
    names = ["dx", "dls", "dlb", "dwqkv", "dbqkv", "dwproj", "dbproj"]
    for n, a, b in zip(names, g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3,
            err_msg=f"gradient mismatch: {n}")


def test_nhwc_branch_bf16_close():
    B, H, W, C, heads, g = 2, 16, 16, 64, 2, 4
    args = _make_nhwc_args(jax.random.PRNGKey(2), B, H, W, C, jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = attn_branch_nhwc_pallas(*args, heads, g, 1e-5, True)
    want = _ref_nhwc(*args, heads, 1e-5, g, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=5e-2, rtol=5e-2)
