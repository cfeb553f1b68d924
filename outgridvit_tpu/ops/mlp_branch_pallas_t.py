"""Transposed-layout fused pre-LN channel-MLP branch (Pallas TPU).

Same math as :mod:`outgridvit_tpu.ops.mlp_branch_pallas` — one kernel for
``y = fc2(act(fc1(LN(x))))`` with a recompute backward — but every tensor is
laid out TRANSPOSED inside the kernel: tokens on the 128-wide lane dim,
channels on the 8-granular sublane dim.

Why: this model's channel counts (48..256, hidden 144..768) live on the lane
dim in the row-major layout Pallas mandates, so every block is padded up to
128 lanes (C=48 wastes 62% of the bandwidth and VPU width). Meanwhile the
optimized-HLO layouts XLA itself picks for these tensors (profiled: layouts
like ``{0,2,1:T(8,128)}``) put the LARGE token/group dim on lanes and C on
sublanes, where padding granularity is 8 — i.e. XLA already stores these
arrays "transposed". Feeding the kernel ``x.T`` row-major matches that
physical form: no lane padding inside the kernel and no layout copy at the
``pallas_call`` boundary.

Numerics are kept operation-for-operation identical to the untransposed
kernel (fp32 LN stats, bf16 MXU ops with fp32 accumulation, exact-GELU via
the Abramowitz-Stegun erf — Mosaic has no erf lowering).

Reference behavior being fused: `src/model/Out_Grid_Block.py:84-89` /
`src/model/outlook_attention.py:33-49` (norm -> MLP, pre-LN branch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.ops.mlp_branch_pallas import _ACTS, _env_kib


def _ln_cols_fp32(x, ls, lb, eps):
    """LayerNorm over axis 0 (channels on sublanes). x: [C, mt];
    ls/lb: [C, 1] fp32. Same op ordering as the row-layout `_ln_fp32`."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=0, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(x32 * x32, axis=0, keepdims=True)
                      - mu * mu)
    rstd = jax.lax.rsqrt(var + eps)
    return (x32 - mu) * (rstd * ls) + lb, mu, rstd


def _fwd_kernel(x_ref, ls_ref, lb_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
                o_ref, *, act: str, eps: float, apply_ln: bool):
    act_f, _ = _ACTS[act]
    x = x_ref[...]  # [C, mt]
    if apply_ln:
        xn, _, _ = _ln_cols_fp32(x, ls_ref[...], lb_ref[...], eps)
        xn = xn.astype(x.dtype)
    else:
        xn = x
    # h[h,m] = sum_c w1[c,h] xn[c,m]  (w1t = w1^T, MXU-native contraction)
    h = jax.lax.dot_general(
        w1t_ref[...], xn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = (h + b1_ref[...].astype(jnp.float32)).astype(x.dtype)
    a = act_f(h.astype(jnp.float32)).astype(x.dtype)
    y = jax.lax.dot_general(
        w2t_ref[...], a, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = (y + b2_ref[...].astype(jnp.float32)).astype(x.dtype)


def _bwd_kernel(x_ref, ls_ref, lb_ref, w1_ref, w1t_ref, w2_ref, b1_ref,
                dy_ref, dx_ref, dls_ref, dlb_ref, dw1_ref, db1_ref,
                dw2_ref, db2_ref, *, act: str, eps: float, apply_ln: bool):
    act_f, act_g = _ACTS[act]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]  # [C, mt]
    cdt = x.dtype

    if apply_ln:
        ls = ls_ref[...]
        xn32, mu, rstd = _ln_cols_fp32(x, ls, lb_ref[...], eps)
        xhat = (x.astype(jnp.float32) - mu) * rstd
        xn = xn32.astype(cdt)
    else:
        xn = x
    h = jax.lax.dot_general(
        w1t_ref[...], xn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h32 = (h + b1_ref[...].astype(jnp.float32)).astype(cdt).astype(jnp.float32)
    a = act_f(h32).astype(cdt)

    dy = dy_ref[...]  # [C, mt]
    lanes = (((1,), (1,)), ((), ()))   # contract over the token lanes
    sub = (((1,), (0,)), ((), ()))     # standard MXU contraction

    # dw2[h,c] = sum_m a[h,m] dy[c,m]
    dw2_ref[...] += jax.lax.dot_general(
        a, dy, dimension_numbers=lanes, preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dy.astype(jnp.float32), axis=1, keepdims=True)
    # da[h,m] = sum_c w2[h,c] dy[c,m]
    da = jax.lax.dot_general(
        w2_ref[...], dy, dimension_numbers=sub,
        preferred_element_type=jnp.float32)
    dh = (da * act_g(h32)).astype(cdt)

    # dw1[c,h] = sum_m xn[c,m] dh[h,m]
    dw1_ref[...] += jax.lax.dot_general(
        xn, dh, dimension_numbers=lanes, preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dh.astype(jnp.float32), axis=1, keepdims=True)
    # dxn[c,m] = sum_h w1[c,h] dh[h,m]
    dxn = jax.lax.dot_general(
        w1_ref[...], dh, dimension_numbers=sub,
        preferred_element_type=jnp.float32)

    if apply_ln:
        dls_ref[...] += jnp.sum(dxn * xhat, axis=1, keepdims=True)
        dlb_ref[...] += jnp.sum(dxn, axis=1, keepdims=True)
        dxhat = dxn * ls.astype(jnp.float32)
        dx = rstd * (
            dxhat
            - jnp.mean(dxhat, axis=0, keepdims=True)
            - xhat * jnp.mean(dxhat * xhat, axis=0, keepdims=True)
        )
        dx_ref[...] = dx.astype(cdt)
    else:
        dx_ref[...] = dxn.astype(cdt)


def _pick_cols(M: int, C: int, H: int, dtype, fixed: int, budget: int,
               nbufs: int):
    """Lane-tile size: multiple of 128 dividing M.

    The budget is the REAL 16 MiB scoped-VMEM ceiling minus margin, so the
    per-lane estimate must cover the Mosaic stack too: measured ~3.5
    fp32 values live per (C+H) row across fwd and bwd (calibrated on the
    C=48/H=144 and C=64/H=256 stage shapes; the old 4*(C+H) io-only
    estimate let the 64px config overflow the ceiling by 0.5 MiB)."""
    per_col = nbufs * C * dtype.itemsize * 2 + 14 * (C + H)
    mt = max(128, (budget - fixed) // max(1, per_col))
    mt = min(mt, M, 8192)
    mt -= mt % 128
    while mt > 128 and M % mt != 0:
        mt -= 128
    if mt < 128 or M % mt != 0:
        mt = M  # small inputs: single tile
        if M % 128 != 0 and mt * per_col + fixed > budget:
            # M is not lane-divisible, so the ONLY tiling is one big tile —
            # and it does not fit scoped VMEM (e.g. a ViT's B*65 tokens at
            # C=384/H=1536). Signal infeasible; the module layer falls back
            # to unfused XLA.
            return 0
    return mt


def mlp_t_fits(M: int, C: int, H: int, dtype=jnp.bfloat16) -> bool:
    """True if the transposed kernel can tile [M, C]->[M, C] (hidden H)
    within the scoped-VMEM budget, fwd AND bwd. The module layer uses this
    to fall back to unfused XLA for awkward token counts (e.g. a ViT's
    B*65 tokens are not lane-divisible, and a single-tile block may not
    fit)."""
    dt = jnp.dtype(dtype)
    fixed_f = 2 * C * H * dt.itemsize
    fixed_b = 3 * C * H * (dt.itemsize + 4)
    return (_pick_cols(M, C, H, dt, fixed_f,
                       _env_kib("OUTGRIDVIT_MLP_FWD_KIB", 15360) * 1024,
                       nbufs=2) > 0
            and _pick_cols(M, C, H, dt, fixed_b,
                           _env_kib("OUTGRIDVIT_MLP_BWD_KIB", 15360) * 1024,
                           nbufs=3) > 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def mlp_branch_pallas_t(x, ln_scale, ln_bias, w1, b1, w2, b2,
                        act: str, eps: float = 1e-5, apply_ln: bool = True):
    """Fused fc2(act(fc1(LN(x)))), transposed-layout kernel.

    Same signature/semantics as ``mlp_branch_pallas``: x [..., C]; w1 [C, H],
    w2 [H, C]; ln params [C] fp32.
    """
    return _mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, act, eps,
                    apply_ln)[0]


def _mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, act, eps, apply_ln):
    orig_shape = x.shape
    C = orig_shape[-1]
    H = w1.shape[1]
    M = 1
    for d in orig_shape[:-1]:
        M *= d
    xt = x.reshape(M, C).T  # [C, M]; physically XLA's preferred form
    fixed = 2 * C * H * w1.dtype.itemsize
    mt = _pick_cols(M, C, H, x.dtype, fixed,
                    _env_kib("OUTGRIDVIT_MLP_FWD_KIB", 15360) * 1024, nbufs=2)
    ls2 = ln_scale.reshape(C, 1).astype(jnp.float32)
    lb2 = ln_bias.reshape(C, 1).astype(jnp.float32)
    const = lambda i: (0, 0)  # noqa: E731
    yt = pl.pallas_call(
        functools.partial(_fwd_kernel, act=act, eps=eps, apply_ln=apply_ln),
        out_shape=jax.ShapeDtypeStruct((C, M), x.dtype),
        grid=(M // mt,),
        in_specs=[
            pl.BlockSpec((C, mt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, mt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * M * C * H,
            bytes_accessed=2 * M * C * x.dtype.itemsize,
            transcendentals=M * H,
        ),
    )(xt, ls2, lb2, w1.T, b1.reshape(H, 1), w2.T, b2.reshape(C, 1))
    y = yt.T.reshape(orig_shape)
    return y, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _mlp_bwd(act, eps, apply_ln, res, dy):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    orig_shape = x.shape
    C = orig_shape[-1]
    H = w1.shape[1]
    M = 1
    for d in orig_shape[:-1]:
        M *= d
    xt = x.reshape(M, C).T
    dyt = dy.reshape(M, C).T
    fixed = 3 * C * H * (w1.dtype.itemsize + 4)
    mt = _pick_cols(M, C, H, x.dtype, fixed,
                    _env_kib("OUTGRIDVIT_MLP_BWD_KIB", 15360) * 1024, nbufs=3)
    ls2 = ln_scale.reshape(C, 1).astype(jnp.float32)
    lb2 = ln_bias.reshape(C, 1).astype(jnp.float32)
    const = lambda i: (0, 0)  # noqa: E731
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, act=act, eps=eps, apply_ln=apply_ln),
        out_shape=(
            jax.ShapeDtypeStruct((C, M), x.dtype),
            jax.ShapeDtypeStruct((C, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, H), jnp.float32),
            jax.ShapeDtypeStruct((H, 1), jnp.float32),
            jax.ShapeDtypeStruct((H, C), jnp.float32),
            jax.ShapeDtypeStruct((C, 1), jnp.float32),
        ),
        grid=(M // mt,),
        in_specs=[
            pl.BlockSpec((C, mt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, mt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, mt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), const, memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * M * C * H,
            bytes_accessed=3 * M * C * x.dtype.itemsize,
            transcendentals=2 * M * H,
        ),
    )(xt, ls2, lb2, w1, w1.T, w2, b1.reshape(H, 1), dyt)
    dxt, dls, dlb, dw1, db1, dw2, db2 = outs
    return (
        dxt.T.reshape(orig_shape),
        dls.reshape(C).astype(ln_scale.dtype),
        dlb.reshape(C).astype(ln_bias.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(H).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(C).astype(b2.dtype),
    )


mlp_branch_pallas_t.defvjp(_mlp_fwd, _mlp_bwd)
