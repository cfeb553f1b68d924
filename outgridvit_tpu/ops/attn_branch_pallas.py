"""Fully-fused grid-attention *branch* as one Pallas TPU kernel.

Round-1 profiling left grid attention as the largest per-step cost even after
the fused softmax(qk^T)v kernel (ops/grid_attention_pallas.py): the branch
still round-trips HBM four times per token — LN write, qkv-projection write
(3C wide), attention-out write, out-projection write — and each leg again in
the backward. This kernel computes the whole pre-LN attention branch

    y = proj( MHSA( qkv_proj( LN(x) ) ) )

for a VMEM tile of grids in ONE program: the only HBM traffic is reading x
(+ the small weights) and writing y. The backward is a second Pallas kernel
(recompute style — nothing but x and the weights is saved between passes),
with the weight/LN-parameter gradients accumulated in the output blocks
across the sequential TPU grid (constant index_map => the accumulator block
stays resident in VMEM and is flushed once).

Semantics match the unfused Flax composition exactly:
- LN follows flax's ``nn.LayerNorm``: fp32 fast-variance stats clamped at 0,
  ``y = (x - mean) * (rsqrt(var+eps) * scale) + bias`` (see
  flax/linen/normalization.py), cast to the compute dtype;
- projections are plain ``x @ W + b`` in the compute dtype with fp32 MXU
  accumulation (what ``nn.Dense(dtype=bf16)`` lowers to);
- the attention core reuses :func:`_attn_tile` / the block-diagonal grid
  packing from ops/grid_attention_pallas.py.

Reference behavior being fused: `src/model/Out_Grid_Block.py:69-83`
(norm2 -> grid attention -> proj).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.ops.grid_attention_pallas import (
    _attn_tile,
    _block_mask,
    _pick_pack,
)


def _layernorm_fp32(x, ls, lb, eps):
    """flax nn.LayerNorm numerics: fp32 fast variance, clamp, scale-fused
    rsqrt. x: [..., C] any float dtype; ls/lb: [C] fp32. Returns fp32."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu)
    rstd = jax.lax.rsqrt(var + eps)
    mul = rstd * ls
    return (x32 - mu) * mul + lb, mu, rstd


def _rows_fwd(x, ls, lb, wqkv, bqkv, wp, bp, mask, *, heads: int,
              scale: float, eps: float, apply_ln: bool):
    """Whole-branch forward on a VMEM-resident tile of token groups.

    x: [gt, PN, C]; ls/lb: [1, C] fp32; weights as in the public API;
    mask: [PN, PN] additive fp32 block-diag packing mask, or ``None`` when
    every group is exactly one attention window (the NHWC kernel). Shared
    by the token-layout and NHWC-layout pallas kernels so the math has one
    source of truth. Returns [gt, PN, C] in x.dtype.
    """
    gt, PN, C = x.shape
    if apply_ln:
        xn, _, _ = _layernorm_fp32(x, ls.reshape(1, 1, C),
                                   lb.reshape(1, 1, C), eps)
        xn = xn.astype(x.dtype)
    else:
        xn = x
    x2 = xn.reshape(gt * PN, C)
    qkv = jnp.dot(x2, wqkv, preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv.astype(jnp.float32)).astype(x.dtype)
    out = _attn_tile(qkv.reshape(gt, PN, 3 * C), heads, scale,
                     0.0 if mask is None else mask)
    o2 = jnp.dot(out.reshape(gt * PN, C), wp,
                 preferred_element_type=jnp.float32)
    return (o2 + bp.astype(jnp.float32)).astype(x.dtype).reshape(gt, PN, C)


def _fwd_kernel(mask_ref, x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref,
                wp_ref, bp_ref, o_ref, *, heads: int, scale: float,
                eps: float, apply_ln: bool):
    o_ref[...] = _rows_fwd(
        x_ref[...], ls_ref[...], lb_ref[...], wqkv_ref[...], bqkv_ref[...],
        wp_ref[...], bp_ref[...], mask_ref[...], heads=heads, scale=scale,
        eps=eps, apply_ln=apply_ln)


def _rows_bwd(x, ls, lb, wqkv, bqkv, wp, bp, dy, mask, *, heads: int,
              scale: float, eps: float, apply_ln: bool):
    """Whole-branch backward (recompute style) on a VMEM tile.

    Same tile layout/contract as :func:`_rows_fwd` (``dy`` like ``x``;
    ``mask`` may be ``None``). Returns the tile's gradient contributions
    ``(dx [gt,PN,C] in x.dtype, dls [1,C], dlb [1,C], dwqkv [C,3C],
    dbqkv [1,3C], dwp [C,C], dbp [1,C])`` — parameter grads in fp32, to be
    accumulated by the caller across the sequential pallas grid.
    """
    gt, PN, C = x.shape
    rows = gt * PN
    cdt = x.dtype

    # ---- recompute forward up to qkv ----
    if apply_ln:
        xn32, mu, rstd = _layernorm_fp32(x, ls.reshape(1, 1, C),
                                         lb.reshape(1, 1, C), eps)
        xhat2 = ((x.astype(jnp.float32) - mu) * rstd).reshape(rows, C)
        xnb = xn32.astype(cdt)
    else:
        xnb = x
    x2 = xnb.reshape(rows, C)
    qkv = jnp.dot(x2, wqkv, preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv.astype(jnp.float32)).astype(cdt)
    q3 = qkv.reshape(gt, PN, 3 * C)
    hd = C // heads

    # ---- proj backward ----
    dy2 = dy.reshape(rows, C)
    dbp = jnp.sum(dy2.astype(jnp.float32), axis=0, keepdims=True)
    # dout = dy @ Wp^T   (y = out @ Wp)
    dout2 = jax.lax.dot_general(
        dy2, wp,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)
    do3 = dout2.reshape(gt, PN, C)

    # ---- attention backward per head (recompute a) ----
    bd = (((2,), (2,)), ((0,), (0,)))
    dqs, dks, dvs, outs_h = [], [], [], []
    for h in range(heads):
        qh = q3[:, :, h * hd:(h + 1) * hd]
        kh = q3[:, :, C + h * hd:C + (h + 1) * hd]
        vh = q3[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        doh = do3[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        logits = jax.lax.dot_general(
            qh, kh, dimension_numbers=bd,
            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            logits = logits + mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        a = e / jnp.sum(e, axis=-1, keepdims=True)  # [gt, PN, PN] f32
        ab = a.astype(cdt)

        # out_h = a v, kept for the dWp accumulation after the loop
        out_h = jax.lax.dot_general(
            ab, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(cdt)
        outs_h.append(out_h)

        dv = jax.lax.dot_general(
            a, doh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            doh, vh.astype(jnp.float32), dimension_numbers=bd,
            preferred_element_type=jnp.float32)
        da = a * (dp - jnp.sum(dp * a, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(
            da, kh.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            da, qh.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)

    # dWp = out^T @ dy over all rows of the tile
    out2 = jnp.concatenate(outs_h, axis=-1).reshape(rows, C)
    dwp = jax.lax.dot_general(
        out2, dy2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # [gt, PN, 3C] f32
    dqkv2 = dqkv.reshape(rows, 3 * C)
    dqkvb = dqkv2.astype(cdt)

    # ---- qkv-projection backward ----
    dwqkv = jax.lax.dot_general(
        x2, dqkvb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv2, axis=0, keepdims=True)
    dxn2 = jax.lax.dot_general(
        dqkvb, wqkv,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [rows, C] f32

    # ---- LN backward ----
    if apply_ln:
        dls = jnp.sum(dxn2 * xhat2, axis=0, keepdims=True)
        dlb = jnp.sum(dxn2, axis=0, keepdims=True)
        dxhat = (dxn2 * ls.astype(jnp.float32)).reshape(gt, PN, C)
        xhat3 = xhat2.reshape(gt, PN, C)
        dx = rstd * (
            dxhat
            - jnp.mean(dxhat, axis=-1, keepdims=True)
            - xhat3 * jnp.mean(dxhat * xhat3, axis=-1, keepdims=True)
        )
        dx = dx.astype(cdt)
    else:
        dls = jnp.zeros((1, C), jnp.float32)
        dlb = jnp.zeros((1, C), jnp.float32)
        dx = dxn2.reshape(gt, PN, C).astype(cdt)
    return dx, dls, dlb, dwqkv, dbqkv, dwp, dbp


def _bwd_kernel(mask_ref, x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref,
                wp_ref, bp_ref, dy_ref,
                dx_ref, dls_ref, dlb_ref, dwqkv_ref, dbqkv_ref,
                dwp_ref, dbp_ref, *, heads: int, scale: float, eps: float,
                apply_ln: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)

    dx, dls, dlb, dwqkv, dbqkv, dwp, dbp = _rows_bwd(
        x_ref[...], ls_ref[...], lb_ref[...], wqkv_ref[...], bqkv_ref[...],
        wp_ref[...], bp_ref[...], dy_ref[...], mask_ref[...], heads=heads,
        scale=scale, eps=eps, apply_ln=apply_ln)
    dx_ref[...] = dx
    dls_ref[...] += dls
    dlb_ref[...] += dlb
    dwqkv_ref[...] += dwqkv
    dbqkv_ref[...] += dbqkv
    dwp_ref[...] += dwp
    dbp_ref[...] += dbp


def _env_kib(name: str, default_kib: int) -> int:
    """VMEM budget override in KiB (A/B knob, same family as
    OUTGRIDVIT_ATTN_FWD_KIB): larger tiles amortize the resident weight
    blocks over more grids per program."""
    import os

    try:
        return int(os.environ.get(name, default_kib))
    except ValueError:
        return default_kib


def _pick_tile_branch(G: int, PN: int, C: int, dtype, fixed_bytes: int,
                      vmem_budget: int, fp32_factor: int):
    """Tile over the packed-group dim. ``fixed_bytes`` covers weight blocks +
    accumulators (grid-invariant); per-group cost counts the double-buffered
    x/dy/dx blocks, the fp32 qkv/dqkv intermediates, and ``fp32_factor``
    live [PN, PN] attention tensors."""
    per_group = (
        2 * 3 * PN * C * dtype.itemsize       # x, dy, dx blocks (2-buffered)
        + 2 * PN * 3 * C * 4                   # qkv + dqkv fp32
        + PN * PN * 4 * fp32_factor
    )
    gt = max(1, (vmem_budget - fixed_bytes) // max(1, per_group))
    gt = min(gt, G, 512)
    while G % gt != 0:
        gt -= 1
    return gt


def _prep(x, heads):
    Bgrp, N, C3 = x.shape
    C = C3  # x carries C, not 3C
    hd = C // heads
    scale = hd**-0.5
    P = _pick_pack(N)
    while Bgrp % P != 0 and P > 1:
        P //= 2
    G, PN = Bgrp // P, P * N
    mask = jnp.asarray(_block_mask(P, N))
    return C, scale, G, PN, mask


def attn_branch_feasible(Bgrp: int, N: int, C: int, heads: int,
                         dtype_str: str = "bfloat16",
                         apply_ln: bool = True) -> bool:
    """True iff the fused branch kernel COMPILES — forward and backward —
    for this exact token shape on the current backend (same cached
    compile-probe discipline as ``attn_kernel_feasible``: the verdict
    comes from the compiler, not a VMEM heuristic)."""
    from outgridvit_tpu.ops.probe_cache import cached_probe

    if jax.default_backend() != "tpu":
        return True  # interpret/test paths have no scoped-VMEM ceiling
    dt = jnp.dtype(dtype_str)

    def loss(x, ls, lb, wqkv, bqkv, wp, bp):
        y = attn_branch_pallas(x, ls, lb, wqkv, bqkv, wp, bp, heads,
                               1e-5, apply_ln)
        return jnp.sum(y.astype(jnp.float32))

    specs = (
        jax.ShapeDtypeStruct((Bgrp, N, C), dt),
        jax.ShapeDtypeStruct((C,), jnp.float32),
        jax.ShapeDtypeStruct((C,), jnp.float32),
        jax.ShapeDtypeStruct((C, 3 * C), dt),
        jax.ShapeDtypeStruct((3 * C,), dt),
        jax.ShapeDtypeStruct((C, C), dt),
        jax.ShapeDtypeStruct((C,), dt),
    )
    return cached_probe(
        f"tpu:branch:{Bgrp}:{N}:{C}:{heads}:{dtype_str}:{int(apply_ln)}:"
        f"{_env_kib('OUTGRIDVIT_BRANCH_FWD_KIB', 3072)}:"
        f"{_env_kib('OUTGRIDVIT_BRANCH_BWD_KIB', 6144)}",
        lambda: jax.jit(
            jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))
        ).lower(*specs).compile())


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def attn_branch_pallas(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                       heads: int, eps: float = 1e-5,
                       apply_ln: bool = True):
    """Fused proj(MHSA(qkv(LN(x)))). x: [Bgrp, N, C] -> [Bgrp, N, C].

    ln_scale/ln_bias: [C] fp32 (pass ones/zeros with ``apply_ln=False`` to
    skip the norm). wqkv: [C, 3C], bqkv: [3C], wproj: [C, C], bproj: [C] in
    the compute dtype.
    """
    return _branch_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                       heads, eps, apply_ln)[0]


def _branch_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, heads, eps,
                apply_ln):
    Bgrp, N, C = x.shape
    _, scale, G, PN, mask = _prep(x, heads)
    fixed = C * 3 * C * wqkv.dtype.itemsize + C * C * wproj.dtype.itemsize
    gt = _pick_tile_branch(
        G, PN, C, x.dtype, fixed,
        vmem_budget=_env_kib("OUTGRIDVIT_BRANCH_FWD_KIB", 3072) * 1024,
        fp32_factor=3)
    x2 = x.reshape(G, PN, C)
    ls2 = ln_scale.reshape(1, C).astype(jnp.float32)
    lb2 = ln_bias.reshape(1, C).astype(jnp.float32)
    out2 = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, scale=scale, eps=eps,
                          apply_ln=apply_ln),
        out_shape=jax.ShapeDtypeStruct((G, PN, C), x.dtype),
        grid=(G // gt,),
        in_specs=[
            pl.BlockSpec((PN, PN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, PN, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gt, PN, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * PN * (4 * C * C + PN * C)
            + 4 * G * PN * PN * C,
            bytes_accessed=2 * G * PN * C * x.dtype.itemsize,
            transcendentals=G * PN * PN * heads,
        ),
    )(mask, x2, ls2, lb2, wqkv, bqkv.reshape(1, 3 * C), wproj,
      bproj.reshape(1, C))
    y = out2.reshape(Bgrp, N, C)
    return y, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)


def _branch_bwd(heads, eps, apply_ln, res, dy):
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj = res
    Bgrp, N, C = x.shape
    _, scale, G, PN, mask = _prep(x, heads)
    fixed = (C * 3 * C * (wqkv.dtype.itemsize + 4)
             + C * C * (wproj.dtype.itemsize + 4))
    gt = _pick_tile_branch(
        G, PN, C, x.dtype, fixed,
        vmem_budget=_env_kib("OUTGRIDVIT_BRANCH_BWD_KIB", 6144) * 1024,
        fp32_factor=8)
    x2 = x.reshape(G, PN, C)
    dy2 = dy.reshape(G, PN, C)
    ls2 = ln_scale.reshape(1, C).astype(jnp.float32)
    lb2 = ln_bias.reshape(1, C).astype(jnp.float32)
    const = lambda i: (0, 0)  # noqa: E731
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, scale=scale, eps=eps,
                          apply_ln=apply_ln),
        out_shape=(
            jax.ShapeDtypeStruct((G, PN, C), x.dtype),      # dx
            jax.ShapeDtypeStruct((1, C), jnp.float32),       # dls
            jax.ShapeDtypeStruct((1, C), jnp.float32),       # dlb
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),   # dwqkv
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),   # dbqkv
            jax.ShapeDtypeStruct((C, C), jnp.float32),       # dwp
            jax.ShapeDtypeStruct((1, C), jnp.float32),       # dbp
        ),
        grid=(G // gt,),
        in_specs=[
            pl.BlockSpec((PN, PN), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, PN, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, PN, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((gt, PN, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * G * PN * (4 * C * C + PN * C)
            + 10 * G * PN * PN * C,
            bytes_accessed=3 * G * PN * C * x.dtype.itemsize,
            transcendentals=G * PN * PN * heads,
        ),
    )(mask, x2, ls2, lb2, wqkv, bqkv.reshape(1, 3 * C), wproj,
      bproj.reshape(1, C), dy2)
    dx, dls, dlb, dwqkv, dbqkv, dwp, dbp = outs
    return (
        dx.reshape(Bgrp, N, C),
        dls.reshape(C).astype(ln_scale.dtype),
        dlb.reshape(C).astype(ln_bias.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv.reshape(3 * C).astype(bqkv.dtype),
        dwp.astype(wproj.dtype),
        dbp.reshape(C).astype(bproj.dtype),
    )


attn_branch_pallas.defvjp(_branch_fwd, _branch_bwd)
