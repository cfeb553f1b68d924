"""Fused pre-LN channel-MLP *branch* as one Pallas TPU kernel.

Profiling (scripts/profile_step.py, round 2) attributes ~20% of the Model-A
train step to the channel MLPs and another slice to their LayerNorms: on
these small channel counts (48..256) each Dense is layout-bound and every
LN/fc1/act/fc2 leg round-trips HBM, with the backward's weight-gradient
dots costing 4-5x their FLOP time. This kernel computes the whole branch

    y = fc2( act( fc1( LN(x) ) ) )

for a VMEM tile of tokens in one program (read x, write y), with a
recompute-style backward kernel that accumulates the weight/LN-parameter
gradients in VMEM across the sequential TPU grid.

Numerics match the unfused Flax composition: LN per flax ``nn.LayerNorm``
(fp32 fast-variance stats), Dense in the compute dtype with fp32 MXU
accumulation, activation applied to the fc1 output (computed in fp32, cast
back to the compute dtype). Activations are selected by NAME ("gelu" exact,
"silu", "relu" — the reference's surface, `src/model/outlook_attention.py:6-14`)
with hand-written derivatives: Mosaic has no erf/erfc lowering, so exact
GELU uses an Abramowitz-Stegun 7.1.26 erf (|err| <= 1.5e-7 — below bf16 and
below the fp32 test tolerance).

Reference behavior being fused: `src/model/Out_Grid_Block.py:84-89` /
`src/model/outlook_attention.py:33-49` (norm3 -> MLP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf32(x):
    """Abramowitz & Stegun 7.1.26 rational erf, fp32, |err| <= 1.5e-7.
    Mosaic-lowerable (exp + polynomials only)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu32(x):
    return 0.5 * x * (1.0 + _erf32(x * _INV_SQRT2))


def _gelu_grad32(x):
    return (0.5 * (1.0 + _erf32(x * _INV_SQRT2))
            + x * _INV_SQRT_2PI * jnp.exp(-0.5 * x * x))


def _silu32(x):
    return x * jax.nn.sigmoid(x)


def _silu_grad32(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _relu32(x):
    return jnp.maximum(x, 0.0)


def _relu_grad32(x):
    return (x > 0.0).astype(x.dtype)


# name -> (f, f') on fp32
_ACTS = {
    "gelu": (_gelu32, _gelu_grad32),
    "silu": (_silu32, _silu_grad32),
    "relu": (_relu32, _relu_grad32),
}


def _ln_fp32(x, ls, lb, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(x32 * x32, axis=-1, keepdims=True)
                      - mu * mu)
    rstd = jax.lax.rsqrt(var + eps)
    return (x32 - mu) * (rstd * ls) + lb, mu, rstd


def _fwd_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, act: str, eps: float, apply_ln: bool):
    act_f, _ = _ACTS[act]
    x = x_ref[...]
    if apply_ln:
        xn, _, _ = _ln_fp32(x, ls_ref[...], lb_ref[...], eps)
        xn = xn.astype(x.dtype)
    else:
        xn = x
    h = jnp.dot(xn, w1_ref[...], preferred_element_type=jnp.float32)
    h = (h + b1_ref[...].astype(jnp.float32)).astype(x.dtype)
    a = act_f(h.astype(jnp.float32)).astype(x.dtype)
    y = jnp.dot(a, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (y + b2_ref[...].astype(jnp.float32)).astype(x.dtype)


def _bwd_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
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

    x = x_ref[...]
    cdt = x.dtype
    M, C = x.shape

    # recompute forward
    if apply_ln:
        ls = ls_ref[...]
        xn32, mu, rstd = _ln_fp32(x, ls, lb_ref[...], eps)
        xhat = (x.astype(jnp.float32) - mu) * rstd
        xn = xn32.astype(cdt)
    else:
        xn = x
    h = jnp.dot(xn, w1_ref[...], preferred_element_type=jnp.float32)
    h32 = (h + b1_ref[...].astype(jnp.float32)).astype(cdt).astype(jnp.float32)
    a = act_f(h32).astype(cdt)

    dy = dy_ref[...]
    rows = (((0,), (0,)), ((), ()))     # contract over token rows
    lastlast = (((1,), (1,)), ((), ()))  # y = a @ W2  =>  da = dy @ W2^T

    dw2_ref[...] += jax.lax.dot_general(
        a, dy, dimension_numbers=rows, preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    da = jax.lax.dot_general(
        dy, w2_ref[...], dimension_numbers=lastlast,
        preferred_element_type=jnp.float32)
    dh = (da * act_g(h32)).astype(cdt)

    dw1_ref[...] += jax.lax.dot_general(
        xn, dh, dimension_numbers=rows, preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dh.astype(jnp.float32), axis=0, keepdims=True)
    dxn = jax.lax.dot_general(
        dh, w1_ref[...], dimension_numbers=lastlast,
        preferred_element_type=jnp.float32)  # [M, C] fp32

    if apply_ln:
        dls_ref[...] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
        dlb_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)
        dxhat = dxn * ls.astype(jnp.float32)
        dx = rstd * (
            dxhat
            - jnp.mean(dxhat, axis=-1, keepdims=True)
            - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        )
        dx_ref[...] = dx.astype(cdt)
    else:
        dx_ref[...] = dxn.astype(cdt)


def _env_kib(name: str, default_kib: int) -> int:
    import os

    try:
        return int(os.environ.get(name, default_kib))
    except ValueError:
        return default_kib


def _pick_rows(M: int, C: int, H: int, dtype, fixed: int, budget: int,
               nbufs: int):
    per_row = nbufs * C * dtype.itemsize * 2 + 2 * H * 4 + 2 * C * 4
    mt = max(8, (budget - fixed) // max(1, per_row))
    mt = min(mt, M, 4096)
    mt -= mt % 8
    while mt > 8 and M % mt != 0:
        mt -= 8
    if M % mt != 0:
        mt = 8
    return mt


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def mlp_branch_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2,
                      act: str, eps: float = 1e-5, apply_ln: bool = True):
    """Fused fc2(act(fc1(LN(x)))). x: [..., C] -> same shape.

    ``act`` is an activation NAME from {"gelu", "silu", "relu"} (static).
    ln params: [C] fp32; weights in the compute dtype: w1 [C, H], b1 [H],
    w2 [H, C], b2 [C].
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
    x2 = x.reshape(M, C)
    fixed = (C * H + H * C) * w1.dtype.itemsize
    mt = _pick_rows(M, C, H, x.dtype, fixed,
                    _env_kib("OUTGRIDVIT_MLP_FWD_KIB", 6144) * 1024, nbufs=2)
    ls2 = ln_scale.reshape(1, C).astype(jnp.float32)
    lb2 = ln_bias.reshape(1, C).astype(jnp.float32)
    const = lambda i: (0, 0)  # noqa: E731
    y2 = pl.pallas_call(
        functools.partial(_fwd_kernel, act=act, eps=eps, apply_ln=apply_ln),
        out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        grid=(M // mt,),
        in_specs=[
            pl.BlockSpec((mt, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mt, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * M * C * H,
            bytes_accessed=2 * M * C * x.dtype.itemsize,
            transcendentals=M * H,
        ),
    )(x2, ls2, lb2, w1, b1.reshape(1, H), w2, b2.reshape(1, C))
    return (y2.reshape(orig_shape),
            (x, ln_scale, ln_bias, w1, b1, w2, b2))


def _mlp_bwd(act, eps, apply_ln, res, dy):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    orig_shape = x.shape
    C = orig_shape[-1]
    H = w1.shape[1]
    M = 1
    for d in orig_shape[:-1]:
        M *= d
    x2 = x.reshape(M, C)
    dy2 = dy.reshape(M, C)
    fixed = (C * H + H * C) * (w1.dtype.itemsize + 4)
    mt = _pick_rows(M, C, H, x.dtype, fixed,
                    _env_kib("OUTGRIDVIT_MLP_BWD_KIB", 6144) * 1024, nbufs=3)
    ls2 = ln_scale.reshape(1, C).astype(jnp.float32)
    lb2 = ln_bias.reshape(1, C).astype(jnp.float32)
    const = lambda i: (0, 0)  # noqa: E731
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, act=act, eps=eps, apply_ln=apply_ln),
        out_shape=(
            jax.ShapeDtypeStruct((M, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        grid=(M // mt,),
        in_specs=[
            pl.BlockSpec((mt, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((mt, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((mt, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * M * C * H,
            bytes_accessed=3 * M * C * x.dtype.itemsize,
            transcendentals=2 * M * H,
        ),
    )(x2, ls2, lb2, w1, b1.reshape(1, H), w2, b2.reshape(1, C), dy2)
    dx, dls, dlb, dw1, db1, dw2, db2 = outs
    return (
        dx.reshape(orig_shape),
        dls.reshape(C).astype(ln_scale.dtype),
        dlb.reshape(C).astype(ln_bias.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(H).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(C).astype(b2.dtype),
    )


mlp_branch_pallas.defvjp(_mlp_fwd, _mlp_bwd)
