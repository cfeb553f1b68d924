"""Transposed-layout 3x3 depthwise convolution (Pallas TPU).

XLA's lowering of NHWC depthwise convs on these shapes (C=192..1024,
H=W=32..4) is the single most expensive op family left in the train step
(fwd + bwd + the weight-grad reduction fusions). A depthwise 3x3 is just 9
shift-scale-accumulate taps, which maps perfectly onto the VPU **if** the
big batch*width product rides the 128-wide lane dim:

    layout [C*H, B*W]   (channels*height on 8-granular sublanes)

Each tap is then: shift rows/lanes by one, mask the image-internal borders
(row iota % H, lane iota % W — images never straddle a lane tile because W
divides the tile), multiply by the per-channel scalar tap weight (a [C*H,1]
column), accumulate. All channels are vectorized; nothing is looped but the
9 taps. Zero padding comes out naturally: shifted-in rows/lanes at block
edges are zeros and interior image borders are masked.

Backward is the flipped-kernel conv for dx (same kernel body, negated
offsets) plus an in-VMEM accumulated weight grad (per tap: masked-shift *
dy, reduced over lanes and H).

Stride 1, kernel 3x3, no bias (the model's MBConv uses BN). The module
layer falls back to ``lax.conv_general_dilated`` otherwise.

Reference behavior: `src/model/mbc_conv.py:44-98` (depthwise stage of the
inverted residual block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OFFS = ((-1, -1), (-1, 0), (-1, 1),
         (0, -1), (0, 0), (0, 1),
         (1, -1), (1, 0), (1, 1))  # (dy, dx) = (ky-1, kx-1), row-major taps


def _shift(x, dy, dx):
    """s[r, l] = x[r + dy, l + dx], zero-filled at the block edges."""
    R, L = x.shape
    z = jnp.zeros_like
    if dy == -1:
        x = jnp.concatenate([z(x[:1]), x[:-1]], axis=0)
    elif dy == 1:
        x = jnp.concatenate([x[1:], z(x[:1])], axis=0)
    if dx == -1:
        x = jnp.concatenate([z(x[:, :1]), x[:, :-1]], axis=1)
    elif dx == 1:
        x = jnp.concatenate([x[:, 1:], z(x[:, :1])], axis=1)
    return x


def _mask(hi, wi, dy, dx, H, W):
    m = None

    def _and(a, b):
        return b if a is None else a & b

    if dy == -1:
        m = _and(m, hi != 0)
    elif dy == 1:
        m = _and(m, hi != H - 1)
    if dx == -1:
        m = _and(m, wi != 0)
    elif dx == 1:
        m = _and(m, wi != W - 1)
    return m


def _iotas(R, L, H, W):
    hi = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0) % H
    wi = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1) % W
    return hi, wi


def _fwd_kernel(x_ref, w_ref, o_ref, *, H: int, W: int):
    x = x_ref[...].astype(jnp.float32)  # [Cb*H, Lt]
    R, L = x.shape
    hi, wi = _iotas(R, L, H, W)
    acc = jnp.zeros((R, L), jnp.float32)
    for t, (dy, dx) in enumerate(_OFFS):
        s = _shift(x, dy, dx)
        m = _mask(hi, wi, dy, dx, H, W)
        if m is not None:
            s = jnp.where(m, s, 0.0)
        acc = acc + s * w_ref[:, t: t + 1].astype(jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _bwd_kernel(x_ref, w_ref, dy_ref, dx_ref, dw_ref, *, H: int, W: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    R, L = x.shape
    Cb = R // H
    hi, wi = _iotas(R, L, H, W)
    acc = jnp.zeros((R, L), jnp.float32)
    for t, (dy_o, dx_o) in enumerate(_OFFS):
        # dx[r,l] = sum_t w[t] dy[r - dy_o, l - dx_o] (flipped-kernel conv)
        s = _shift(dy, -dy_o, -dx_o)
        m = _mask(hi, wi, -dy_o, -dx_o, H, W)
        if m is not None:
            s = jnp.where(m, s, 0.0)
        acc = acc + s * w_ref[:, t: t + 1].astype(jnp.float32)
        # dw[t,c] = sum_{valid} x[r + dy_o, l + dx_o] * dy[r, l]
        sx = _shift(x, dy_o, dx_o)
        mx = _mask(hi, wi, dy_o, dx_o, H, W)
        if mx is not None:
            sx = jnp.where(mx, sx, 0.0)
        prod = sx * dy
        # stay rank-2 throughout (Mosaic rejects rank-1 layouts here):
        # lanes first, then the H rows within each channel block
        col = jnp.sum(prod, axis=1, keepdims=True)        # [Cb*H, 1]
        dw_ref[:, t: t + 1] += jnp.sum(
            col.reshape(Cb, H), axis=1, keepdims=True)     # [Cb, 1]
    dx_ref[...] = acc.astype(dx_ref.dtype)


def _env_kib(name: str, default_kib: int) -> int:
    import os

    try:
        return int(os.environ.get(name, default_kib))
    except ValueError:
        return default_kib


def _tiles(C, H, BW, itemsize, budget, nbufs, f32_live):
    """(channel-block, lane-tile). Lane tiles are multiples of 128 (every
    W divides 128); channel blocks keep ~<=1024 rows in VMEM."""
    cb = max(1, 1024 // H)
    cb = min(cb, C)
    while C % cb != 0:
        cb -= 1
    rows = cb * H
    # nbufs double-buffered io blocks + the kernel's live fp32 working
    # arrays (Mosaic stack), all sized [rows, lane]
    per_lane = nbufs * 2 * rows * itemsize + f32_live * rows * 4
    lt = max(128, budget // max(1, per_lane))
    lt = min(lt, BW, 8192)
    lt -= lt % 128
    while lt > 128 and BW % lt != 0:
        lt -= 128
    if lt < 128 or BW % lt != 0:
        lt = BW
    return cb, lt


@jax.custom_vjp
def dwconv3x3_t(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3, stride 1, pad 1. x: [B,H,W,C]; w: [3,3,C] -> y like x."""
    return _fwd(x, w)[0]


def _to_t(x):
    B, H, W, C = x.shape
    return x.transpose(3, 1, 0, 2).reshape(C * H, B * W)


def _from_t(xt, B, H, W, C):
    return xt.reshape(C, H, B, W).transpose(2, 1, 3, 0)


def _fwd(x, w):
    B, H, W, C = x.shape
    xt = _to_t(x)
    wexp = jnp.repeat(w.reshape(9, C).T, H, axis=0)  # [C*H, 9] tap columns
    cb, lt = _tiles(C, H, B * W, x.dtype.itemsize,
                    _env_kib("OUTGRIDVIT_DW_FWD_KIB", 10240) * 1024, 2, 5)
    rows = cb * H
    yt = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, W=W),
        out_shape=jax.ShapeDtypeStruct((C * H, B * W), x.dtype),
        grid=(C // cb, (B * W) // lt),
        in_specs=[
            pl.BlockSpec((rows, lt), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 9), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, lt), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=18 * B * H * W * C,
            bytes_accessed=2 * B * H * W * C * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xt, wexp.astype(jnp.float32))
    return _from_t(yt, B, H, W, C), (x, w)


def _bwd(res, dy):
    x, w = res
    B, H, W, C = x.shape
    xt = _to_t(x)
    dyt = _to_t(dy)
    wexp = jnp.repeat(w.reshape(9, C).T, H, axis=0)
    cb, lt = _tiles(C, H, B * W, x.dtype.itemsize,
                    _env_kib("OUTGRIDVIT_DW_BWD_KIB", 10240) * 1024, 3, 12)
    rows = cb * H
    dxt, dwt = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, W=W),
        out_shape=(
            jax.ShapeDtypeStruct((C * H, B * W), x.dtype),
            jax.ShapeDtypeStruct((C, 9), jnp.float32),
        ),
        grid=(C // cb, (B * W) // lt),
        in_specs=[
            pl.BlockSpec((rows, lt), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 9), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, lt), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, lt), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 9), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=45 * B * H * W * C,
            bytes_accessed=4 * B * H * W * C * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xt, wexp.astype(jnp.float32), dyt)
    dw = dwt.T.reshape(3, 3, C).astype(w.dtype)
    return _from_t(dxt, B, H, W, C), dw


dwconv3x3_t.defvjp(_fwd, _bwd)
