"""NHWC-direct fused grid-attention branch: partition folded into BlockSpecs.

The fused branch kernel (ops/attn_branch_pallas.py) consumes tokens in the
``grid_partition`` layout, so every call pays two XLA layout copies in the
forward (partition + unpartition — the 6-D transposes profiled at ~0.4 ms
each on the 64px stage-0 tensors, docs/PERFORMANCE.md round 4) and their
mirrors in the backward. This variant reads the RAW NHWC tensor instead:

- the input is viewed as ``[B, Hg, g, Wg, g, C]`` — a free dimension-split
  reshape of NHWC (no data movement);
- each pallas block takes one ``gy`` residue row-slab ``[bt, Hg, 1, Wg, g,
  C]`` — whole W rows, so the HBM DMA runs are ``W*C`` contiguous bytes;
- the per-window token grouping (the partition's transpose) happens
  IN VMEM on the resident block, where it is a register shuffle instead of
  an HBM round-trip; the output is untransposed the same way and written
  straight back to NHWC.

Semantics are exactly ``grid_unpartition(attn_branch(grid_partition(x)))``
— the window (gy, gx) holds pixels ``(i*g+gy, j*g+gx)`` (dilated MaxViT
grids, reference `src/model/grid_partition.py:3-32`), and the branch math
is shared with the token-layout kernel (`_rows_fwd` / `_rows_bwd`), so the
two kernels cannot drift.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.ops.attn_branch_pallas import (
    _env_kib,
    _rows_bwd,
    _rows_fwd,
)


def _fwd_kernel(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
                o_ref, *, heads: int, scale: float, eps: float,
                apply_ln: bool):
    xb = x_ref[...]                       # [bt, Hg, 1, Wg, g, C]
    bt, Hg, _, Wg, g, C = xb.shape
    # partition transpose, VMEM-local: rows (hg, wg) grouped per gx window
    x3 = jnp.transpose(xb.reshape(bt, Hg, Wg, g, C),
                       (0, 3, 1, 2, 4)).reshape(bt * g, Hg * Wg, C)
    out = _rows_fwd(x3, ls_ref[...], lb_ref[...], wqkv_ref[...],
                    bqkv_ref[...], wp_ref[...], bp_ref[...], None,
                    heads=heads, scale=scale, eps=eps, apply_ln=apply_ln)
    o5 = jnp.transpose(out.reshape(bt, g, Hg, Wg, C), (0, 2, 3, 1, 4))
    o_ref[...] = o5.reshape(bt, Hg, 1, Wg, g, C)


def _bwd_kernel(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
                dy_ref, dx_ref, dls_ref, dlb_ref, dwqkv_ref, dbqkv_ref,
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

    xb = x_ref[...]
    bt, Hg, _, Wg, g, C = xb.shape

    def to_rows(a):
        return jnp.transpose(a.reshape(bt, Hg, Wg, g, C),
                             (0, 3, 1, 2, 4)).reshape(bt * g, Hg * Wg, C)

    dx, dls, dlb, dwqkv, dbqkv, dwp, dbp = _rows_bwd(
        to_rows(xb), ls_ref[...], lb_ref[...], wqkv_ref[...], bqkv_ref[...],
        wp_ref[...], bp_ref[...], to_rows(dy_ref[...]), None, heads=heads,
        scale=scale, eps=eps, apply_ln=apply_ln)
    dx5 = jnp.transpose(dx.reshape(bt, g, Hg, Wg, C), (0, 2, 3, 1, 4))
    dx_ref[...] = dx5.reshape(bt, Hg, 1, Wg, g, C)
    dls_ref[...] += dls
    dlb_ref[...] += dlb
    dwqkv_ref[...] += dwqkv
    dbqkv_ref[...] += dbqkv
    dwp_ref[...] += dwp
    dbp_ref[...] += dbp


def _pick_bt(B: int, g: int, N: int, C: int, dtype, fixed_bytes: int,
             vmem_budget: int, fp32_factor: int):
    """Batch-entries per block: each carries g windows of N tokens. Counts
    the double-buffered x/dy/dx blocks, fp32 qkv/dqkv, and ``fp32_factor``
    live [N, N] attention tensors per window (same accounting as
    attn_branch_pallas._pick_tile_branch)."""
    per_b = g * (
        2 * 3 * N * C * dtype.itemsize
        + 2 * N * 3 * C * 4
        + N * N * 4 * fp32_factor
    )
    bt = max(1, (vmem_budget - fixed_bytes) // max(1, per_b))
    bt = min(bt, B, 256)
    while B % bt != 0:
        bt -= 1
    return bt


def _common_specs(bt, Hg, Wg, g, C):
    blk = lambda i: (i // g, 0, i % g, 0, 0, 0)  # noqa: E731
    const = lambda i: (0, 0)  # noqa: E731
    x_spec = pl.BlockSpec((bt, Hg, 1, Wg, g, C), blk,
                          memory_space=pltpu.VMEM)
    w_specs = [
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),       # ls
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),       # lb
        pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),   # wqkv
        pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),   # bqkv
        pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),       # wproj
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),       # bproj
    ]
    return x_spec, w_specs, const


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def attn_branch_nhwc_pallas(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                            heads: int, grid_size: int, eps: float = 1e-5,
                            apply_ln: bool = True):
    """Fused proj(MHSA(qkv(LN(x)))) over dilated grids, NHWC in/out.

    x: [B, H, W, C] -> [B, H, W, C]; numerically identical to
    ``grid_unpartition(attn_branch_pallas(grid_partition(x, g)...), meta)``
    with the partition/unpartition done by block index maps instead of XLA
    layout copies. Weight layout matches attn_branch_pallas.
    """
    return _nhwc_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                     heads, grid_size, eps, apply_ln)[0]


def _geom(x, heads, g):
    B, H, W, C = x.shape
    if H % g or W % g:
        raise ValueError(
            f"H and W must be divisible by grid_size; got {H}x{W}, g={g}")
    Hg, Wg = H // g, W // g
    return B, H, W, C, Hg, Wg, Hg * Wg, (C // heads) ** -0.5


def _nhwc_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, heads, g,
              eps, apply_ln):
    B, H, W, C, Hg, Wg, N, scale = _geom(x, heads, g)
    fixed = C * 3 * C * wqkv.dtype.itemsize + C * C * wproj.dtype.itemsize
    bt = _pick_bt(B, g, N, C, x.dtype, fixed,
                  _env_kib("OUTGRIDVIT_BRANCH_FWD_KIB", 3072) * 1024, 3)
    x6 = x.reshape(B, Hg, g, Wg, g, C)  # free split, no data movement
    x_spec, w_specs, _ = _common_specs(bt, Hg, Wg, g, C)
    out6 = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, scale=scale, eps=eps,
                          apply_ln=apply_ln),
        out_shape=jax.ShapeDtypeStruct((B, Hg, g, Wg, g, C), x.dtype),
        grid=((B // bt) * g,),
        in_specs=[x_spec] + w_specs,
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * g * g * N * (4 * C * C + N * C)
            + 4 * B * g * g * N * N * C,
            bytes_accessed=2 * B * H * W * C * x.dtype.itemsize,
            transcendentals=B * g * g * N * N * heads,
        ),
    )(x6, ln_scale.reshape(1, C).astype(jnp.float32),
      ln_bias.reshape(1, C).astype(jnp.float32), wqkv,
      bqkv.reshape(1, 3 * C), wproj, bproj.reshape(1, C))
    y = out6.reshape(B, H, W, C)
    return y, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)


def _nhwc_bwd(heads, g, eps, apply_ln, res, dy):
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj = res
    B, H, W, C, Hg, Wg, N, scale = _geom(x, heads, g)
    fixed = (C * 3 * C * (wqkv.dtype.itemsize + 4)
             + C * C * (wproj.dtype.itemsize + 4))
    bt = _pick_bt(B, g, N, C, x.dtype, fixed,
                  _env_kib("OUTGRIDVIT_BRANCH_BWD_KIB", 6144) * 1024, 8)
    x6 = x.reshape(B, Hg, g, Wg, g, C)
    dy6 = dy.reshape(B, Hg, g, Wg, g, C)
    x_spec, w_specs, const = _common_specs(bt, Hg, Wg, g, C)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, scale=scale, eps=eps,
                          apply_ln=apply_ln),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hg, g, Wg, g, C), x.dtype),  # dx
            jax.ShapeDtypeStruct((1, C), jnp.float32),            # dls
            jax.ShapeDtypeStruct((1, C), jnp.float32),            # dlb
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),        # dwqkv
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),        # dbqkv
            jax.ShapeDtypeStruct((C, C), jnp.float32),            # dwp
            jax.ShapeDtypeStruct((1, C), jnp.float32),            # dbp
        ),
        grid=((B // bt) * g,),
        in_specs=[x_spec] + w_specs + [x_spec],
        out_specs=(
            x_spec,
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * g * g * N * (4 * C * C + N * C)
            + 10 * B * g * g * N * N * C,
            bytes_accessed=3 * B * H * W * C * x.dtype.itemsize,
            transcendentals=B * g * g * N * N * heads,
        ),
    )(x6, ln_scale.reshape(1, C).astype(jnp.float32),
      ln_bias.reshape(1, C).astype(jnp.float32), wqkv,
      bqkv.reshape(1, 3 * C), wproj, bproj.reshape(1, C), dy6)
    dx, dls, dlb, dwqkv, dbqkv, dwp, dbp = outs
    return (
        dx.reshape(B, H, W, C),
        dls.reshape(C).astype(ln_scale.dtype),
        dlb.reshape(C).astype(ln_bias.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv.reshape(3 * C).astype(bqkv.dtype),
        dwp.astype(wproj.dtype),
        dbp.reshape(C).astype(bproj.dtype),
    )


attn_branch_nhwc_pallas.defvjp(_nhwc_fwd, _nhwc_bwd)


def attn_branch_nhwc_feasible(B: int, H: int, W: int, C: int, heads: int,
                              g: int, dtype_str: str = "bfloat16",
                              apply_ln: bool = True) -> bool:
    """True iff the NHWC branch kernel COMPILES (fwd + bwd) for this exact
    shape on the current backend (cached compile-probe; the probe cache
    appends the TPU device kind to the key)."""
    from outgridvit_tpu.ops.probe_cache import cached_probe

    if jax.default_backend() != "tpu":
        return True  # interpret/test paths have no scoped-VMEM ceiling
    dt = jnp.dtype(dtype_str)

    def loss(x, ls, lb, wqkv, bqkv, wp, bp):
        y = attn_branch_nhwc_pallas(x, ls, lb, wqkv, bqkv, wp, bp, heads,
                                    g, 1e-5, apply_ln)
        return jnp.sum(y.astype(jnp.float32))

    specs = (
        jax.ShapeDtypeStruct((B, H, W, C), dt),
        jax.ShapeDtypeStruct((C,), jnp.float32),
        jax.ShapeDtypeStruct((C,), jnp.float32),
        jax.ShapeDtypeStruct((C, 3 * C), dt),
        jax.ShapeDtypeStruct((3 * C,), dt),
        jax.ShapeDtypeStruct((C, C), dt),
        jax.ShapeDtypeStruct((C,), dt),
    )
    return cached_probe(
        f"tpu:branchnhwc:{B}:{H}:{W}:{C}:{heads}:{g}:{dtype_str}:"
        f"{int(apply_ln)}:"
        f"{_env_kib('OUTGRIDVIT_BRANCH_FWD_KIB', 3072)}:"
        f"{_env_kib('OUTGRIDVIT_BRANCH_BWD_KIB', 6144)}",
        lambda: jax.jit(
            jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))
        ).lower(*specs).compile())
