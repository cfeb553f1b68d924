"""Transposed-layout fused MLP-branch kernel vs unfused composition
(interpret mode, CPU).

Validates ops/mlp_branch_pallas_t.py — the default TPU MLP path since the
layout redesign (tokens on lanes, channels on sublanes) — against the exact
Flax composition, forward and full backward, including non-128-multiple
token counts (single-tile fallback).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.ops.activations import make_activation
from outgridvit_tpu.ops.mlp_branch_pallas_t import mlp_branch_pallas_t
from tests.test_mlp_branch_pallas import _make, _ref


@pytest.mark.parametrize("actname", ["gelu", "silu"])
@pytest.mark.parametrize("apply_ln", [True, False])
def test_mlp_branch_t_forward(actname, apply_ln):
    act = make_activation(actname)
    args = _make(jax.random.PRNGKey(0), 256, 48, 96, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = mlp_branch_pallas_t(*args, actname, 1e-5, apply_ln)
    want = _ref(*args, act, 1e-5, apply_ln)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_mlp_branch_t_odd_rows():
    # M=64 is not a lane multiple: exercises the single-tile fallback
    act = make_activation("gelu")
    args = _make(jax.random.PRNGKey(3), 64, 48, 96, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = mlp_branch_pallas_t(*args, "gelu", 1e-5, True)
    want = _ref(*args, act, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_mlp_branch_t_grads():
    # M=64 (not a full stage tile): grads are per-row; larger M only
    # changes tiling, which the multitile test covers
    act = make_activation("gelu")
    args = _make(jax.random.PRNGKey(1), 64, 48, 96, jnp.float32)
    argnums = tuple(range(7))

    def loss_pal(*a):
        return (mlp_branch_pallas_t(*a, "gelu", 1e-5, True)
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


@pytest.mark.slow
def test_mlp_branch_t_matches_row_kernel_multitile(monkeypatch):
    # tiny tile budget forces 3 lane-tiles of 128: exercises the sequential
    # grid and the in-VMEM weight-grad accumulation across tiles
    monkeypatch.setenv("OUTGRIDVIT_MLP_FWD_KIB", "64")
    monkeypatch.setenv("OUTGRIDVIT_MLP_BWD_KIB", "64")
    from outgridvit_tpu.ops.mlp_branch_pallas import mlp_branch_pallas

    args = _make(jax.random.PRNGKey(2), 384, 48, 144, jnp.float32)

    def loss_t(*a):
        return (mlp_branch_pallas_t(*a, "gelu", 1e-5, True)
                .astype(jnp.float32) ** 2).sum()

    def loss_row(*a):
        return (mlp_branch_pallas(*a, "gelu", 1e-5, True)
                .astype(jnp.float32) ** 2).sum()

    argnums = tuple(range(7))
    with pltpu.force_tpu_interpret_mode():
        got = mlp_branch_pallas_t(*args, "gelu", 1e-5, True)
        want = mlp_branch_pallas(*args, "gelu", 1e-5, True)
        g1 = jax.grad(loss_t, argnums)(*args)
        g2 = jax.grad(loss_row, argnums)(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)
    for n, a, b in zip(["dx", "dls", "dlb", "dw1", "db1", "dw2", "db2"],
                       g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3,
            err_msg=f"gradient mismatch: {n}")
