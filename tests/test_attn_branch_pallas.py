"""Fused attention-branch kernel vs unfused XLA composition (interpret mode).

Validates ops/attn_branch_pallas.py — proj(MHSA(qkv(LN(x)))) in one kernel —
against the exact Flax composition it replaces (LayerNorm -> Dense(3C) ->
MHSA math -> Dense(C)), forward and full backward (input + every weight/LN
parameter), on CPU via the Pallas interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.ops.attn_branch_pallas import attn_branch_pallas


def _ref_branch(x, ls, lb, wqkv, bqkv, wproj, bproj, heads, eps,
                apply_ln=True):
    B, N, C = x.shape
    hd = C // heads
    if apply_ln:
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.maximum(0.0, jnp.mean(x32 * x32, -1, keepdims=True) - mu**2)
        xn = ((x32 - mu) * (jax.lax.rsqrt(var + eps) * ls) + lb).astype(x.dtype)
    else:
        xn = x
    qkv = (xn @ wqkv.astype(x.dtype)) + bqkv.astype(x.dtype)
    qkv_ = qkv.reshape(B, N, 3, heads, hd)
    q, k, v = qkv_[:, :, 0], qkv_[:, :, 1], qkv_[:, :, 2]
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * (hd**-0.5)
    a = jax.nn.softmax(logits, -1)
    out = jnp.einsum("bhnm,bmhd->bnhd", a.astype(x.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(B, N, C)
    return (out @ wproj.astype(x.dtype)) + bproj.astype(x.dtype)


def _make_args(key, B, N, C, dtype):
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (B, N, C), dtype)
    ls = 1.0 + 0.1 * jax.random.normal(ks[1], (C,), jnp.float32)
    lb = 0.1 * jax.random.normal(ks[2], (C,), jnp.float32)
    wqkv = (jax.random.normal(ks[3], (C, 3 * C), jnp.float32) * C**-0.5
            ).astype(dtype)
    bqkv = (0.02 * jax.random.normal(ks[4], (3 * C,), jnp.float32)
            ).astype(dtype)
    wproj = (jax.random.normal(ks[5], (C, C), jnp.float32) * C**-0.5
             ).astype(dtype)
    bproj = (0.02 * jax.random.normal(ks[6], (C,), jnp.float32)).astype(dtype)
    return x, ls, lb, wqkv, bqkv, wproj, bproj


@pytest.mark.parametrize("B,N,C,heads", [(64, 16, 48, 2), (32, 4, 64, 2)])
@pytest.mark.parametrize("apply_ln", [True, False])
def test_attn_branch_forward_matches_ref(B, N, C, heads, apply_ln):
    args = _make_args(jax.random.PRNGKey(0), B, N, C, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = attn_branch_pallas(*args, heads, 1e-5, apply_ln)
    want = _ref_branch(*args, heads, 1e-5, apply_ln)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


@pytest.mark.slow  # opt-in kernel; fwd equivalence stays fast
def test_attn_branch_grads_match_ref():
    B, N, C, heads, eps = 32, 16, 48, 2, 1e-5
    args = _make_args(jax.random.PRNGKey(1), B, N, C, jnp.float32)
    argnums = tuple(range(7))

    def loss_pal(*a):
        return (attn_branch_pallas(*a, heads, eps, True)
                .astype(jnp.float32) ** 2).sum()

    def loss_ref(*a):
        return (_ref_branch(*a, heads, eps, True)
                .astype(jnp.float32) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_pal, argnums)(*args)
    g2 = jax.grad(loss_ref, argnums)(*args)
    names = ["dx", "dls", "dlb", "dwqkv", "dbqkv", "dwproj", "dbproj"]
    for n, a, b in zip(names, g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3,
            err_msg=f"gradient mismatch: {n}")


def test_attn_branch_bf16_close():
    B, N, C, heads = 32, 16, 48, 2
    args = _make_args(jax.random.PRNGKey(2), B, N, C, jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = attn_branch_pallas(*args, heads, 1e-5, True)
    want = _ref_branch(*args, heads, 1e-5, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=5e-2, rtol=5e-2)
