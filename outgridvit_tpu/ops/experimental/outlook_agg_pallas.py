"""Fused outlook aggregate + output projection (Pallas TPU, row layout).

The XLA path (`ops/outlook.py::outlook_aggregate_xla`) lowers to 9
shifted slice-multiply-accumulate fusions — each tap re-reads ``v`` from
HBM, and the projection dense then reads/writes the aggregate once more;
the backward is worse (9 dynamic-update-slice accumulations into ``dv``).
This kernel computes the whole value path of the outlooker —
``out = aggregate(v, attn) @ Wp + bp`` — in ONE pass per image: ``v`` and
``attn`` are read once, the aggregate lives only in VMEM, and the
projection rides the MXU per block. The custom VJP recomputes the
aggregate (the standard recompute pattern used by the attention kernels)
and emits ``dv``/``dattn`` in one haloed pass instead of XLA's 9+9
scatter/reduce fusions.

Layout (the round-2 lesson, same as ``ops/experimental/dwconv_bwd_pallas.py``): blocks
are whole-image ``[H*W, C]`` slices of the ``[B, H*W, C]`` view — channels
stay on the native LANES, the flattened spatial dim rides the sublanes,
and a tap shift is a sublane-dim concatenate plus an interior-border iota
mask. Nothing moves across lanes.

The per-pixel, per-head attention weight is expanded to per-channel form
on the MXU: ``W_tap = attn2 @ E_t`` where ``E_t[h*9+t', c] = (head(c)==h
and t'==t)`` — an exact selection matrix built from iota in-kernel (one
1.0 per column), so the expansion is lane-aligned and bit-exact.

Reference semantics: `src/model/outlook_attention.py:91-124` (the unfold
aggregation, stride 1) followed by the `proj` linear.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.ops.experimental.dwconv_bwd_pallas import (  # same tap geometry
    _OFFS,
    _border_mask,
    _shift_flat,
)


def _exp_mat(t: int, heads: int, hd: int) -> jnp.ndarray:
    """[heads*9, C] selection matrix for tap ``t``: one 1.0 per column at
    row head(c)*9 + t."""
    h9, C = heads * 9, heads * hd
    r = jax.lax.broadcasted_iota(jnp.int32, (h9, C), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (h9, C), 1)
    return ((c // hd) * 9 + t == r).astype(jnp.float32)


def _taps(v32, a32, hi, wi, H, W, heads, hd):
    """Yield (tap weight [S, C] f32, border-masked shifted v [S, C] f32)."""
    for t, (dy_o, dx_o) in enumerate(_OFFS):
        wt = jnp.dot(a32, _exp_mat(t, heads, hd),
                     preferred_element_type=jnp.float32)
        sv = _shift_flat(v32, dy_o, dx_o, W)
        m = _border_mask(hi, wi, dy_o, dx_o, H, W)
        if m is not None:
            sv = jnp.where(m, sv, 0.0)
        yield t, dy_o, dx_o, wt, sv



def _agg_whole(v32, a32, hi, wi, H, W, heads, hd):
    """fp32 aggregate over the whole-image taps."""
    acc = jnp.zeros_like(v32)
    for _, _, _, wt, sv in _taps(v32, a32, hi, wi, H, W, heads, hd):
        acc = acc + sv * wt
    return acc


def _agg_chunk(ext, a32, wi, W, bh, heads, hd):
    """fp32 aggregate over the haloed-chunk taps."""
    acc = jnp.zeros((bh * W, ext.shape[-1]), jnp.float32)
    for _, _, _, wt, sv in _chunk_taps(ext, a32, wi, W, bh, heads, hd):
        acc = acc + sv * wt
    return acc


def _proj_grads(y, g, wp_ref, dwp_ref, dbp_ref):
    """Accumulate the projection grads; return dyag = g @ Wp^T."""
    dwp_ref[...] = dwp_ref[...] + jax.lax.dot_general(
        y, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbp_ref[...] = dbp_ref[...] + jnp.sum(
        g.astype(jnp.float32), axis=0, keepdims=True)
    return jax.lax.dot_general(
        g, wp_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _bwd_taps(v32, a32, dyag, hi, wi, H, W, heads, hd):
    """(dv, da) for the whole-image layout.

    da[s, h*9+t] = sum_{c in head h} sv[s, c] * dyag[s, c];
    dv[q] += dyag[q - off] * wt[q - off], source-masked at borders."""
    S = v32.shape[0]
    dv = jnp.zeros_like(v32)
    da = jnp.zeros((S, heads * 9), jnp.float32)
    for t, dy_o, dx_o, wt, sv in _taps(v32, a32, hi, wi, H, W, heads, hd):
        da = da + jnp.dot(sv * dyag, _exp_mat(t, heads, hd).T,
                          preferred_element_type=jnp.float32)
        z = _shift_flat(dyag * wt, -dy_o, -dx_o, W)
        m = _border_mask(hi, wi, -dy_o, -dx_o, H, W)
        if m is not None:
            z = jnp.where(m, z, 0.0)
        dv = dv + z
    return dv, da


def _bwd_taps_chunk(ext, a32, dyag, wi, W, bh, heads, hd):
    """(dv_ext [bh*W + 2W + 2, C] with corner pads, da) for the chunked
    layout: dv_ext[q] += (dyag*wt)[p] at padded-ext offset 1+W+off."""
    S = bh * W
    C = ext.shape[-1]
    ne = S + 2 * W + 2
    dv_ext = jnp.zeros((ne, C), jnp.float32)
    da = jnp.zeros((S, heads * 9), jnp.float32)
    for t, dy_o, dx_o, wt, sv in _chunk_taps(ext, a32, wi, W, bh, heads,
                                             hd):
        da = da + jnp.dot((sv * dyag).astype(a32.dtype),
                          _exp_mat(t, heads, hd).T.astype(a32.dtype),
                          preferred_element_type=jnp.float32)
        z = _mask_w(dyag * wt, wi, dx_o, W)
        start = 1 + W + dy_o * W + dx_o
        dv_ext = dv_ext + jnp.pad(z, ((start, ne - S - start), (0, 0)))
    return dv_ext, da


def _fwd_kernel(v_ref, a_ref, wp_ref, bp_ref, o_ref, *,
                H: int, W: int, heads: int, hd: int):
    v32 = v_ref[0].astype(jnp.float32)   # [S, C]
    a32 = a_ref[0].astype(jnp.float32)   # [S, heads*9]
    S = v32.shape[0]
    pi = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    hi, wi = pi // W, pi % W
    y = _agg_whole(v32, a32, hi, wi, H, W, heads, hd).astype(v_ref.dtype)
    out = jnp.dot(y, wp_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = (out + bp_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _bwd_kernel(v_ref, a_ref, wp_ref, g_ref, dv_ref, da_ref, dwp_ref,
                dbp_ref, *, H: int, W: int, heads: int, hd: int):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)

    v32 = v_ref[0].astype(jnp.float32)
    a32 = a_ref[0].astype(jnp.float32)
    g = g_ref[0]                          # [S, C], module dtype
    S = v32.shape[0]
    pi = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    hi, wi = pi // W, pi % W

    # recompute the aggregate for the projection grads (recompute-VJP)
    y = _agg_whole(v32, a32, hi, wi, H, W, heads, hd).astype(v_ref.dtype)
    dyag = _proj_grads(y, g, wp_ref, dwp_ref, dbp_ref)
    dv, da = _bwd_taps(v32, a32, dyag, hi, wi, H, W, heads, hd)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    da_ref[0] = da.astype(da_ref.dtype)


# ------------------------------------------------- row-chunked variant
# Whole-image blocks do not fit VMEM at the 64px stage-0 shapes
# (S=4096); this variant grids over (B, H/bh) row chunks. Each program
# sees its [bh*W, C] chunk plus two single-row HALO inputs (the last row
# of the previous chunk / first row of the next, precomputed by strided
# XLA slices with ZERO rows at the image border — zero halos ARE the
# aggregate's zero padding, so no extra H-border masks are needed).
# Backward scatters the halo rows' dv into two small side outputs that
# XLA adds back (strided, tiny).


def _mask_w(x, wi, dx_o, W):
    if dx_o == -1:
        return jnp.where(wi != 0, x, 0.0)
    if dx_o == 1:
        return jnp.where(wi != W - 1, x, 0.0)
    return x


def _chunk_taps(ext, a32, wi, W, bh, heads, hd):
    """Yield (t, off, wt [bh*W, C], sv [bh*W, C]) with sv read from the
    haloed ``ext`` [(bh+2)*W, C] frame; only W-border masks apply."""
    S = bh * W
    # corner taps reach one flat element past the ext frame (p=(0,0) with
    # off=(-1,-1) etc.); pad by one zero element each end — those reads
    # are W-border-masked anyway
    extp = jnp.pad(ext, ((1, 1), (0, 0)))
    for t, (dy_o, dx_o) in enumerate(_OFFS):
        wt = jnp.dot(a32, _exp_mat(t, heads, hd),
                     preferred_element_type=jnp.float32)
        # center rows of the ext frame start at offset W; source pixel
        # p + off sits at ext row offset W + dy_o*W + dx_o (+1 for extp)
        base = 1 + W + dy_o * W + dx_o
        sv = jax.lax.slice(extp, (base, 0), (base + S, extp.shape[1]))
        sv = _mask_w(sv.astype(jnp.float32), wi, dx_o, W)
        yield t, dy_o, dx_o, wt, sv


def _fwd_chunk_kernel(v_ref, top_ref, bot_ref, a_ref, wp_ref, bp_ref,
                      o_ref, *, W: int, bh: int, heads: int, hd: int):
    ext = jnp.concatenate([top_ref[0], v_ref[0], bot_ref[0]], axis=0)
    a32 = a_ref[0].astype(jnp.float32)
    S = bh * W
    wi = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) % W
    y = _agg_chunk(ext, a32, wi, W, bh, heads, hd).astype(v_ref.dtype)
    out = jnp.dot(y, wp_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = (out + bp_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _bwd_chunk_kernel(v_ref, top_ref, bot_ref, a_ref, wp_ref, g_ref,
                      dv_ref, dtop_ref, dbot_ref, da_ref, dwp_ref, dbp_ref,
                      *, W: int, bh: int, heads: int, hd: int):
    b = pl.program_id(0)  # flattened (batch * chunk) grid

    @pl.when(b == 0)
    def _init():
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)

    ext = jnp.concatenate([top_ref[0], v_ref[0], bot_ref[0]], axis=0)
    a32 = a_ref[0].astype(jnp.float32)
    g = g_ref[0]
    S = bh * W
    wi = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) % W

    y = _agg_chunk(ext, a32, wi, W, bh, heads, hd).astype(v_ref.dtype)
    dyag = _proj_grads(y, g, wp_ref, dwp_ref, dbp_ref)
    dv_ext, da = _bwd_taps_chunk(ext, a32, dyag, wi, W, bh, heads, hd)
    dv_ref[0] = dv_ext[1 + W:1 + W + S].astype(dv_ref.dtype)
    dtop_ref[0] = dv_ext[1:1 + W].astype(dtop_ref.dtype)
    dbot_ref[0] = dv_ext[1 + W + S:1 + 2 * W + S].astype(dbot_ref.dtype)
    da_ref[0] = da.astype(da_ref.dtype)


def _vmem_estimate(S: int, C: int, h9: int, itemsize: int) -> int:
    """Backward live-set upper bound (the fatter of the two passes):
    double-buffered io blocks + fp32 accumulators/transients. Lane dims
    pad to 128 in VMEM."""
    cp = max(C, 128) if C % 128 else C
    hp = max(h9, 128) if h9 % 128 else h9
    io = 2 * itemsize * (2 * S * cp + S * hp + S * cp + S * hp)  # v,a,g,dv,da
    f32 = 4 * (S * hp + 4 * S * cp + S * hp)  # a32, dyag/acc/dv/tap, da
    return io + f32


def _budget() -> int:
    import os

    return int(os.environ.get("OUTGRIDVIT_OUTAGG_KIB", 14336)) * 1024


def _pick_bh(H: int, W: int, C: int, h9: int, itemsize: int) -> int:
    """Largest row-chunk height (divisor of H) whose haloed chunk fits
    the VMEM budget; 0 = whole-image blocks fit (no chunking needed);
    -1 = infeasible even at bh=1."""
    budget = _budget()
    if _vmem_estimate(H * W, C, h9, itemsize) <= budget:
        return 0
    for bh in range(H // 2, 0, -1):
        if H % bh == 0 and _vmem_estimate((bh + 2) * W, C, h9,
                                          itemsize) <= budget:
            return bh
    return -1


def outlook_agg_fits(B: int, H: int, W: int, C: int, heads: int,
                     itemsize: int = 2) -> bool:
    """Static feasibility: the [H*W, C] blocks (whole-image or row-chunked
    with halo rows) must fit scoped VMEM (the module dispatch
    double-checks with a cached compile-probe)."""
    if C % heads != 0:
        return False
    return _pick_bh(H, W, C, heads * 9, itemsize) >= 0


@functools.lru_cache(maxsize=None)
def outlook_agg_feasible(B: int, H: int, W: int, C: int, heads: int,
                         dtype_str: str = "bfloat16") -> bool:
    """True iff the kernel pair COMPILES for this exact shape on the
    current backend (AOT probe, cached in-process and on disk — same
    scheme as `dwconv_bwd_pallas.dwconv3x3_bwd_feasible`)."""
    if not outlook_agg_fits(B, H, W, C, heads,
                            jnp.dtype(dtype_str).itemsize):
        return False
    if jax.default_backend() != "tpu":
        return True
    from outgridvit_tpu.ops.probe_cache import cached_probe

    dt = jnp.dtype(dtype_str)
    sv = jax.ShapeDtypeStruct((B, H, W, C), dt)
    sa = jax.ShapeDtypeStruct((B, H, W, heads * 9), dt)
    sw = jax.ShapeDtypeStruct((C, C), dt)
    sb = jax.ShapeDtypeStruct((C,), dt)

    def loss(v, a, wp, bp):
        return jnp.sum(
            outlook_attention_proj_pallas(v, a, wp, bp).astype(jnp.float32))

    return cached_probe(
        f"tpu:outagg:{B}:{H}:{W}:{C}:{heads}:{dtype_str}",
        lambda: jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3))).lower(
            sv, sa, sw, sb).compile())


def _halos(v4, bh):
    """Top/bottom single-row halos per chunk, [B, nch, W, C]: zero rows at
    the image border (zero IS the aggregate's padding semantics)."""
    B, H, W, C = v4.shape
    nch = H // bh
    z = jnp.zeros((B, 1, W, C), v4.dtype)
    top = jnp.concatenate([z, v4[:, bh - 1::bh][:, :nch - 1]], axis=1)
    bot = jnp.concatenate([v4[:, bh::bh], z], axis=1)
    return top, bot


def _fwd_chunked(v, a, wp, bp, bh):
    B, H, W, C = v.shape
    nch = H // bh
    S = bh * W
    heads = a.shape[-1] // 9
    hd = C // heads
    h9 = heads * 9
    top, bot = _halos(v, bh)
    n = B * nch
    out = pl.pallas_call(
        functools.partial(_fwd_chunk_kernel, W=W, bh=bh, heads=heads,
                          hd=hd),
        out_shape=jax.ShapeDtypeStruct((n, S, C), v.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, h9), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=n * S * (2 * 9 * C + 2 * C * C),
            bytes_accessed=n * S * (2 * C + h9) * v.dtype.itemsize,
            transcendentals=0,
        ),
    )(v.reshape(n, S, C), top.reshape(n, W, C), bot.reshape(n, W, C),
      a.reshape(n, S, h9), wp.astype(v.dtype),
      bp.reshape(1, C).astype(v.dtype))
    return out.reshape(B, H, W, C)


def _bwd_chunked(v, a, wp, g, bh):
    B, H, W, C = v.shape
    nch = H // bh
    S = bh * W
    heads = a.shape[-1] // 9
    hd = C // heads
    h9 = heads * 9
    top, bot = _halos(v, bh)
    n = B * nch
    blk = lambda s: pl.BlockSpec((1,) + s, lambda b: (b, 0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    dv, dtop, dbot, da, dwp, dbp = pl.pallas_call(
        functools.partial(_bwd_chunk_kernel, W=W, bh=bh, heads=heads,
                          hd=hd),
        out_shape=(
            jax.ShapeDtypeStruct((n, S, C), v.dtype),
            jax.ShapeDtypeStruct((n, W, C), jnp.float32),
            jax.ShapeDtypeStruct((n, W, C), jnp.float32),
            jax.ShapeDtypeStruct((n, S, h9), a.dtype),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        grid=(n,),
        in_specs=[
            blk((S, C)), blk((W, C)), blk((W, C)), blk((S, h9)),
            pl.BlockSpec((C, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            blk((S, C)),
        ],
        out_specs=(
            blk((S, C)), blk((W, C)), blk((W, C)), blk((S, h9)),
            pl.BlockSpec((C, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * S * (6 * 9 * C + 6 * C * C),
            bytes_accessed=2 * n * S * (2 * C + h9) * v.dtype.itemsize,
            transcendentals=0,
        ),
    )(v.reshape(n, S, C), top.reshape(n, W, C), bot.reshape(n, W, C),
      a.reshape(n, S, h9), wp.astype(v.dtype), g.reshape(n, S, C))
    # halo-row grads belong to the NEIGHBOR chunks: chunk i's top halo is
    # global row i*bh - 1 (= chunk i-1's last row), its bottom halo is
    # row (i+1)*bh (= chunk i+1's first row). Strided adds, tiny arrays.
    dv5 = dv.reshape(B, nch, bh, W, C)
    dt5 = dtop.reshape(B, nch, W, C)
    db5 = dbot.reshape(B, nch, W, C)
    dv5 = dv5.at[:, :-1, bh - 1].add(dt5[:, 1:].astype(dv5.dtype))
    dv5 = dv5.at[:, 1:, 0].add(db5[:, :-1].astype(dv5.dtype))
    return (dv5.reshape(v.shape), da.reshape(a.shape), dwp,
            dbp.reshape(C))


def _fwd_pallas(v, a, wp, bp):
    B, H, W, C = v.shape
    S = H * W
    heads = a.shape[-1] // 9
    hd = C // heads
    h9 = heads * 9
    bh = _pick_bh(H, W, C, h9, v.dtype.itemsize)
    if bh < 0:
        raise ValueError(f"fused outlook kernel infeasible for {v.shape}")
    if bh > 0:
        return _fwd_chunked(v, a, wp, bp, bh)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, W=W, heads=heads, hd=hd),
        out_shape=jax.ShapeDtypeStruct((B, S, C), v.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, h9), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=B * S * (2 * 9 * C + 2 * C * C),
            bytes_accessed=B * S * (2 * C + h9) * v.dtype.itemsize,
            transcendentals=0,
        ),
    )(v.reshape(B, S, C), a.reshape(B, S, h9), wp.astype(v.dtype),
      bp.reshape(1, C).astype(v.dtype))
    return out.reshape(B, H, W, C)


def _bwd_pallas(v, a, wp, g):
    B, H, W, C = v.shape
    S = H * W
    heads = a.shape[-1] // 9
    hd = C // heads
    h9 = heads * 9
    bh = _pick_bh(H, W, C, h9, v.dtype.itemsize)
    if bh < 0:
        raise ValueError(f"fused outlook kernel infeasible for {v.shape}")
    if bh > 0:
        return _bwd_chunked(v, a, wp, g, bh)
    dv, da, dwp, dbp = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, W=W, heads=heads, hd=hd),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, C), v.dtype),
            jax.ShapeDtypeStruct((B, S, h9), a.dtype),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, h9), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, h9), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * S * (6 * 9 * C + 6 * C * C),
            bytes_accessed=2 * B * S * (2 * C + h9) * v.dtype.itemsize,
            transcendentals=0,
        ),
    )(v.reshape(B, S, C), a.reshape(B, S, h9), wp.astype(v.dtype),
      g.reshape(B, S, C))
    return (dv.reshape(v.shape), da.reshape(a.shape), dwp,
            dbp.reshape(C))


@jax.custom_vjp
def outlook_attention_proj_pallas(v, a, wp, bp):
    """``aggregate(v, attn) @ wp + bp`` in one fused pass.

    v: [B, H, W, C] values; a: [B, H, W, heads*9] post-softmax tap
    weights (head-major: index h*9 + t, taps row-major — unfold order);
    wp: [C, C]; bp: [C]. Stride-1, K=3 only. Returns [B, H, W, C].
    """
    return _fwd_pallas(v, a, wp, bp)


def _fwd_vjp(v, a, wp, bp):
    return _fwd_pallas(v, a, wp, bp), (v, a, wp)


def _bwd_vjp(res, g):
    v, a, wp = res
    dv, da, dwp, dbp = _bwd_pallas(v, a, wp, g)
    return dv, da, dwp.astype(wp.dtype), dbp.astype(wp.dtype)


outlook_attention_proj_pallas.defvjp(_fwd_vjp, _bwd_vjp)


# ------------------------------------------- v-fold (full-branch) variant
# OUTGRIDVIT_OUTAGG=2: also folds the value projection into the kernel —
# out = aggregate(x @ Wv + bv, attn) @ Wp + bp. The value tensor never
# touches HBM at all (the base kernel still pays XLA's dense write + one
# kernel read of v); backward additionally emits dx/dWv/dbv in the same
# pass. Costs one extra in-VMEM [.., Cin] block and the two weight tiles.


def _fwdv_kernel(x_ref, a_ref, wv_ref, bv_ref, wp_ref, bp_ref, o_ref, *,
                 H: int, W: int, heads: int, hd: int):
    x = x_ref[0]
    v32 = (jnp.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
           + bv_ref[...].astype(jnp.float32))
    a32 = a_ref[0].astype(jnp.float32)
    S = v32.shape[0]
    pi = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    hi, wi = pi // W, pi % W
    y = _agg_whole(v32, a32, hi, wi, H, W, heads, hd).astype(x_ref.dtype)
    out = jnp.dot(y, wp_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = (out + bp_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _bwdv_kernel(x_ref, a_ref, wv_ref, bv_ref, wp_ref, g_ref,
                 dx_ref, da_ref, dwv_ref, dbv_ref, dwp_ref, dbp_ref, *,
                 H: int, W: int, heads: int, hd: int):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dwv_ref[...] = jnp.zeros_like(dwv_ref)
        dbv_ref[...] = jnp.zeros_like(dbv_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)

    x = x_ref[0]
    v32 = (jnp.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
           + bv_ref[...].astype(jnp.float32))
    a32 = a_ref[0].astype(jnp.float32)
    g = g_ref[0]
    S = v32.shape[0]
    pi = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    hi, wi = pi // W, pi % W

    y = _agg_whole(v32, a32, hi, wi, H, W, heads, hd).astype(x_ref.dtype)
    dyag = _proj_grads(y, g, wp_ref, dwp_ref, dbp_ref)
    dv, da = _bwd_taps(v32, a32, dyag, hi, wi, H, W, heads, hd)
    dvd = dv.astype(x_ref.dtype)
    dx_ref[0] = jax.lax.dot_general(
        dvd, wv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    dwv_ref[...] = dwv_ref[...] + jax.lax.dot_general(
        x, dvd, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbv_ref[...] = dbv_ref[...] + jnp.sum(dv, axis=0, keepdims=True)
    da_ref[0] = da.astype(da_ref.dtype)


def _halo_border_mask(W: int, bh: int, nch: int):
    """[ (bh+2)*W, 1 ] mask zeroing the halo rows that are IMAGE borders
    for the current chunk (x@Wv + bv of a zero x-halo is bv, not the zero
    padding the aggregate's semantics require — mask v, not x)."""
    i = pl.program_id(0) % nch  # chunk index (grid is b*nch + i)
    row = jax.lax.broadcasted_iota(jnp.int32, ((bh + 2) * W, 1), 0)
    top_border = (row < W) & (i == 0)
    bot_border = (row >= (bh + 1) * W) & (i == nch - 1)
    return ~(top_border | bot_border)


def _fwdv_chunk_kernel(x_ref, top_ref, bot_ref, a_ref, wv_ref, bv_ref,
                       wp_ref, bp_ref, o_ref, *,
                       W: int, bh: int, nch: int, heads: int, hd: int):
    ext_x = jnp.concatenate([top_ref[0], x_ref[0], bot_ref[0]], axis=0)
    ext = (jnp.dot(ext_x, wv_ref[...], preferred_element_type=jnp.float32)
           + bv_ref[...].astype(jnp.float32))
    ext = jnp.where(_halo_border_mask(W, bh, nch), ext, 0.0)
    a32 = a_ref[0].astype(jnp.float32)
    S = bh * W
    wi = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) % W
    y = _agg_chunk(ext, a32, wi, W, bh, heads, hd).astype(x_ref.dtype)
    out = jnp.dot(y, wp_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = (out + bp_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _bwdv_chunk_kernel(x_ref, top_ref, bot_ref, a_ref, wv_ref, bv_ref,
                       wp_ref, g_ref, dx_ref, dxt_ref, dxb_ref, da_ref,
                       dwv_ref, dbv_ref, dwp_ref, dbp_ref, *,
                       W: int, bh: int, nch: int, heads: int, hd: int):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dwv_ref[...] = jnp.zeros_like(dwv_ref)
        dbv_ref[...] = jnp.zeros_like(dbv_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)

    ext_x = jnp.concatenate([top_ref[0], x_ref[0], bot_ref[0]], axis=0)
    ext = (jnp.dot(ext_x, wv_ref[...], preferred_element_type=jnp.float32)
           + bv_ref[...].astype(jnp.float32))
    keep = _halo_border_mask(W, bh, nch)
    ext = jnp.where(keep, ext, 0.0)
    a32 = a_ref[0].astype(jnp.float32)
    g = g_ref[0]
    S = bh * W
    wi = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) % W

    y = _agg_chunk(ext, a32, wi, W, bh, heads, hd).astype(x_ref.dtype)
    dyag = _proj_grads(y, g, wp_ref, dwp_ref, dbp_ref)
    dv_ext, da = _bwd_taps_chunk(ext, a32, dyag, wi, W, bh, heads, hd)
    # strip the corner pad elements, then zero the IMAGE-border halo rows:
    # their dv is the grad wrt zero padding, not wrt any x pixel — it must
    # not leak into dWv/dbv/dx
    dvf = jnp.where(keep, dv_ext[1:1 + S + 2 * W], 0.0)
    dvd = dvf.astype(x_ref.dtype)
    dx_ext = jax.lax.dot_general(
        dvd, wv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[0] = dx_ext[W:W + S].astype(dx_ref.dtype)
    dxt_ref[0] = dx_ext[:W].astype(dxt_ref.dtype)
    dxb_ref[0] = dx_ext[W + S:].astype(dxb_ref.dtype)
    dwv_ref[...] = dwv_ref[...] + jax.lax.dot_general(
        ext_x, dvd, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbv_ref[...] = dbv_ref[...] + jnp.sum(dvf, axis=0, keepdims=True)
    da_ref[0] = da.astype(da_ref.dtype)


def _vmem_estimate_v(S: int, Cin: int, C: int, h9: int,
                     itemsize: int) -> int:
    """v-fold backward live-set upper bound: the base estimate plus the
    x/dx io blocks and their fp32 transients plus the weight tiles."""
    cip = max(Cin, 128) if Cin % 128 else Cin
    cp = max(C, 128) if C % 128 else C
    base = _vmem_estimate(S, C, h9, itemsize)
    io = 2 * itemsize * (2 * S * cip)          # x in, dx out (buffered)
    f32 = 4 * (S * cip + S * cp)               # dx_ext / v recompute
    w = 4 * (2 * cip * cp + 2 * cp * cp)
    return base + io + f32 + w


def _pick_bh_v(H: int, W: int, Cin: int, C: int, h9: int,
               itemsize: int) -> int:
    budget = _budget()
    if _vmem_estimate_v(H * W, Cin, C, h9, itemsize) <= budget:
        return 0
    for bh in range(H // 2, 0, -1):
        if H % bh == 0 and _vmem_estimate_v((bh + 2) * W, Cin, C, h9,
                                            itemsize) <= budget:
            return bh
    return -1


def _fwdv_pallas(x, a, wv, bv, wp, bp):
    B, H, W, Cin = x.shape
    S = H * W
    C = wv.shape[1]
    heads = a.shape[-1] // 9
    hd = C // heads
    h9 = heads * 9
    bh = _pick_bh_v(H, W, Cin, C, h9, x.dtype.itemsize)
    if bh < 0:
        raise ValueError(f"fused outlook branch infeasible for {x.shape}")
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    blk = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    wvd = wv.astype(x.dtype)
    bvd = bv.reshape(1, C).astype(x.dtype)
    wpd = wp.astype(x.dtype)
    bpd = bp.reshape(1, C).astype(x.dtype)
    if bh == 0:
        out = pl.pallas_call(
            functools.partial(_fwdv_kernel, H=H, W=W, heads=heads, hd=hd),
            out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
            grid=(B,),
            in_specs=[blk((S, Cin)), blk((S, h9)), const((Cin, C)),
                      const((1, C)), const((C, C)), const((1, C))],
            out_specs=blk((S, C)),
            cost_estimate=pl.CostEstimate(
                flops=B * S * (2 * Cin * C + 2 * 9 * C + 2 * C * C),
                bytes_accessed=B * S * (Cin + C + h9) * x.dtype.itemsize,
                transcendentals=0),
        )(x.reshape(B, S, Cin), a.reshape(B, S, h9), wvd, bvd, wpd, bpd)
        return out.reshape(B, H, W, C)
    nch = H // bh
    Sc = bh * W
    n = B * nch
    top, bot = _halos(x, bh)
    out = pl.pallas_call(
        functools.partial(_fwdv_chunk_kernel, W=W, bh=bh, nch=nch,
                          heads=heads, hd=hd),
        out_shape=jax.ShapeDtypeStruct((n, Sc, C), x.dtype),
        grid=(n,),
        in_specs=[blk((Sc, Cin)), blk((W, Cin)), blk((W, Cin)),
                  blk((Sc, h9)), const((Cin, C)), const((1, C)),
                  const((C, C)), const((1, C))],
        out_specs=blk((Sc, C)),
        cost_estimate=pl.CostEstimate(
            flops=n * Sc * (2 * Cin * C + 2 * 9 * C + 2 * C * C),
            bytes_accessed=n * Sc * (Cin + C + h9) * x.dtype.itemsize,
            transcendentals=0),
    )(x.reshape(n, Sc, Cin), top.reshape(n, W, Cin), bot.reshape(n, W, Cin),
      a.reshape(n, Sc, h9), wvd, bvd, wpd, bpd)
    return out.reshape(B, H, W, C)


def _bwdv_pallas(x, a, wv, bv, wp, g):
    B, H, W, Cin = x.shape
    S = H * W
    C = wv.shape[1]
    heads = a.shape[-1] // 9
    hd = C // heads
    h9 = heads * 9
    bh = _pick_bh_v(H, W, Cin, C, h9, x.dtype.itemsize)
    if bh < 0:
        raise ValueError(f"fused outlook branch infeasible for {x.shape}")
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    blk = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    wvd = wv.astype(x.dtype)
    bvd = bv.reshape(1, C).astype(x.dtype)
    wpd = wp.astype(x.dtype)
    if bh == 0:
        dx, da, dwv, dbv, dwp, dbp = pl.pallas_call(
            functools.partial(_bwdv_kernel, H=H, W=W, heads=heads, hd=hd),
            out_shape=(
                jax.ShapeDtypeStruct((B, S, Cin), x.dtype),
                jax.ShapeDtypeStruct((B, S, h9), a.dtype),
                jax.ShapeDtypeStruct((Cin, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((C, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ),
            grid=(B,),
            in_specs=[blk((S, Cin)), blk((S, h9)), const((Cin, C)),
                      const((1, C)), const((C, C)), blk((S, C))],
            out_specs=(blk((S, Cin)), blk((S, h9)), const((Cin, C)),
                       const((1, C)), const((C, C)), const((1, C))),
            cost_estimate=pl.CostEstimate(
                flops=3 * B * S * (2 * Cin * C + 2 * 9 * C + 2 * C * C),
                bytes_accessed=2 * B * S * (Cin + C + h9) * x.dtype.itemsize,
                transcendentals=0),
        )(x.reshape(B, S, Cin), a.reshape(B, S, h9), wvd, bvd, wpd,
          g.reshape(B, S, C))
        return (dx.reshape(x.shape), da.reshape(a.shape), dwv,
                dbv.reshape(C), dwp, dbp.reshape(C))
    nch = H // bh
    Sc = bh * W
    n = B * nch
    top, bot = _halos(x, bh)
    dx, dxt, dxb, da, dwv, dbv, dwp, dbp = pl.pallas_call(
        functools.partial(_bwdv_chunk_kernel, W=W, bh=bh, nch=nch,
                          heads=heads, hd=hd),
        out_shape=(
            jax.ShapeDtypeStruct((n, Sc, Cin), x.dtype),
            jax.ShapeDtypeStruct((n, W, Cin), jnp.float32),
            jax.ShapeDtypeStruct((n, W, Cin), jnp.float32),
            jax.ShapeDtypeStruct((n, Sc, h9), a.dtype),
            jax.ShapeDtypeStruct((Cin, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        grid=(n,),
        in_specs=[blk((Sc, Cin)), blk((W, Cin)), blk((W, Cin)),
                  blk((Sc, h9)), const((Cin, C)), const((1, C)),
                  const((C, C)), blk((Sc, C))],
        out_specs=(blk((Sc, Cin)), blk((W, Cin)), blk((W, Cin)),
                   blk((Sc, h9)), const((Cin, C)), const((1, C)),
                   const((C, C)), const((1, C))),
        cost_estimate=pl.CostEstimate(
            flops=3 * n * Sc * (2 * Cin * C + 2 * 9 * C + 2 * C * C),
            bytes_accessed=2 * n * Sc * (Cin + C + h9) * x.dtype.itemsize,
            transcendentals=0),
    )(x.reshape(n, Sc, Cin), top.reshape(n, W, Cin), bot.reshape(n, W, Cin),
      a.reshape(n, Sc, h9), wvd, bvd, wpd, g.reshape(n, Sc, C))
    dx5 = dx.reshape(B, nch, bh, W, Cin)
    dt5 = dxt.reshape(B, nch, W, Cin)
    db5 = dxb.reshape(B, nch, W, Cin)
    dx5 = dx5.at[:, :-1, bh - 1].add(dt5[:, 1:].astype(dx5.dtype))
    dx5 = dx5.at[:, 1:, 0].add(db5[:, :-1].astype(dx5.dtype))
    return (dx5.reshape(x.shape), da.reshape(a.shape), dwv,
            dbv.reshape(C), dwp, dbp.reshape(C))


@jax.custom_vjp
def outlook_branch_pallas(x, a, wv, bv, wp, bp):
    """``aggregate(x @ wv + bv, attn) @ wp + bp`` — the outlooker's whole
    value path in one fused pass; the value tensor never touches HBM.

    x: [B, H, W, Cin]; a: [B, H, W, heads*9] post-softmax tap weights
    (head-major); wv: [Cin, C]; bv: [C]; wp: [C, C]; bp: [C].
    Stride-1, K=3 only. Returns [B, H, W, C]."""
    return _fwdv_pallas(x, a, wv, bv, wp, bp)


def _fwdv_vjp(x, a, wv, bv, wp, bp):
    return _fwdv_pallas(x, a, wv, bv, wp, bp), (x, a, wv, bv, wp)


def _bwdv_vjp(res, g):
    x, a, wv, bv, wp = res
    dx, da, dwv, dbv, dwp, dbp = _bwdv_pallas(x, a, wv, bv, wp, g)
    return (dx, da, dwv.astype(wv.dtype), dbv.astype(bv.dtype),
            dwp.astype(wp.dtype), dbp.astype(wp.dtype))


outlook_branch_pallas.defvjp(_fwdv_vjp, _bwdv_vjp)


@functools.lru_cache(maxsize=None)
def outlook_branch_feasible(B: int, H: int, W: int, Cin: int, C: int,
                            heads: int, dtype_str: str = "bfloat16") -> bool:
    """Compile-probe for the v-fold kernel pair (cached like
    `outlook_agg_feasible`)."""
    if C % heads != 0 or _pick_bh_v(H, W, Cin, C, heads * 9,
                                    jnp.dtype(dtype_str).itemsize) < 0:
        return False
    if jax.default_backend() != "tpu":
        return True
    from outgridvit_tpu.ops.probe_cache import cached_probe

    dt = jnp.dtype(dtype_str)
    shapes = (
        jax.ShapeDtypeStruct((B, H, W, Cin), dt),
        jax.ShapeDtypeStruct((B, H, W, heads * 9), dt),
        jax.ShapeDtypeStruct((Cin, C), dt),
        jax.ShapeDtypeStruct((C,), dt),
        jax.ShapeDtypeStruct((C, C), dt),
        jax.ShapeDtypeStruct((C,), dt),
    )

    def loss(*args):
        return jnp.sum(outlook_branch_pallas(*args).astype(jnp.float32))

    return cached_probe(
        f"tpu:outaggv:{B}:{H}:{W}:{Cin}:{C}:{heads}:{dtype_str}",
        lambda: jax.jit(jax.grad(loss, argnums=tuple(range(6)))).lower(
            *shapes).compile())
