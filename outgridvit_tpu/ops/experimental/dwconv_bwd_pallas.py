"""Row-layout fused backward for the 3x3 depthwise convolution (Pallas TPU).

XLA's grouped-conv GRADIENT lowering is the expensive half of the MBConv
depthwise stage: at the 64px configs' stage-0 shapes the dw-weight-grad +
dx reduce fusions run ~3.7x over the HBM roofline (profiled, see
docs/PERFORMANCE.md round-3 notes), because the weight grad is lowered as a
patch-reduce that re-reads the activation per tap. The forward conv is fine
(it rides XLA's conv pipeline); only the backward is replaced.

Layout: blocks are ``[H*W, Ct]`` slices of the ``[B, H*W, C]`` view — the
channel dim stays on the 128 LANES (the array's native row-major minor dim,
so there is no relayout at the kernel boundary, the round-2 lesson from the
transposed kernels), and the flattened spatial dim rides the sublanes. A
tap shift is then a sublane-dim concatenate (by 1 for W, by W for H) plus
an interior-border iota mask; nothing ever moves across lanes — the failure
mode that sank the transposed-layout forward kernel
(``ops/experimental/dwconv_pallas_t.py``, kept as a negative result).

One pass over (x, dy) per program computes BOTH
  dx[p]   = sum_t w[t] * dy[p - off_t]        (flipped-kernel conv), and
  dw[t,c] = sum_p x[p + off_t, c] * dy[p, c]  (per-channel reduce),
with fp32 accumulation. dw accumulates across the batch grid dim in VMEM
(grid iterates batch fastest; the [9, Ct] output block is revisited).

Reference semantics: the depthwise stage of the inverted residual block,
`src/model/mbc_conv.py:44-98` (stride 1, no bias — BN follows).
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


def _shift_flat(x, dy, dx, W):
    """s[p] = x[p + dy*W + dx] over the flattened [H*W, Ct] block,
    zero-filled at the BLOCK edges (interior borders are masked apart)."""
    z = jnp.zeros_like
    if dy == -1:
        x = jnp.concatenate([z(x[:W]), x[:-W]], axis=0)
    elif dy == 1:
        x = jnp.concatenate([x[W:], z(x[:W])], axis=0)
    if dx == -1:
        x = jnp.concatenate([z(x[:1]), x[:-1]], axis=0)
    elif dx == 1:
        x = jnp.concatenate([x[1:], z(x[:1])], axis=0)
    return x


def _border_mask(hi, wi, dy, dx, H, W):
    """Valid-source mask for a (dy, dx) shift: rows whose source pixel falls
    outside the image (top/bottom row, left/right column) read zero."""
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


def _bwd_kernel(x_ref, dy_ref, w_ref, dx_ref, dw_ref, *, H: int, W: int):
    b = pl.program_id(1)  # batch is the FAST grid dim; dw block revisited

    @pl.when(b == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    x = x_ref[0]    # [H*W, Ct]
    dy = dy_ref[0]
    S, Ct = x.shape
    dyf = dy.astype(jnp.float32)
    pi = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    hi, wi = pi // W, pi % W
    acc = jnp.zeros((S, Ct), jnp.float32)
    dws = []
    for t, (dy_o, dx_o) in enumerate(_OFFS):
        # dx[p] += w[t] * dy[p - off]; source valid iff the FORWARD read
        # x[p' + off] with p' = p - off lands on p, i.e. mask with -off
        s = _shift_flat(dyf, -dy_o, -dx_o, W)
        m = _border_mask(hi, wi, -dy_o, -dx_o, H, W)
        if m is not None:
            s = jnp.where(m, s, 0.0)
        acc = acc + s * w_ref[t: t + 1, :].astype(jnp.float32)
        # dw[t] = sum_p x[p + off] * dy[p], source-masked at borders
        sx = _shift_flat(x, dy_o, dx_o, W).astype(jnp.float32)
        mx = _border_mask(hi, wi, dy_o, dx_o, H, W)
        if mx is not None:
            sx = jnp.where(mx, sx, 0.0)
        dws.append(jnp.sum(sx * dyf, axis=0, keepdims=True))  # [1, Ct]
    dx_ref[0] = acc.astype(dx_ref.dtype)
    dw_ref[...] = dw_ref[...] + jnp.concatenate(dws, axis=0)


def _pick_ct(C: int, S: int, itemsize: int, budget: int) -> int:
    """Largest LANE-LEGAL tile (Mosaic: block lane dim must be a multiple
    of 128 or equal the array's lane extent) whose per-program live set
    fits the scoped-VMEM budget: double-buffered io blocks (x, dy in; dx
    out) + the fp32 accumulator/transients."""
    candidates = [C] + [c for c in (256, 128) if C % c == 0 and c < C]
    for ct in candidates:
        io = 2 * (2 * S * ct * itemsize) + 2 * S * ct * itemsize
        f32 = 3 * S * ct * 4  # acc + dyf + one per-tap transient
        if io + f32 <= budget:
            return ct
    return 0


def dwconv3x3_bwd_fits(B: int, H: int, W: int, C: int,
                       itemsize: int = 2) -> bool:
    """Static estimate; the module dispatch double-checks with a cached
    compile-probe of the exact shape (`dwconv3x3_bwd_feasible`)."""
    import os

    budget = int(os.environ.get("OUTGRIDVIT_DWB_KIB", 13312)) * 1024
    return _pick_ct(C, H * W, itemsize, budget) > 0


@functools.lru_cache(maxsize=None)
def dwconv3x3_bwd_feasible(B: int, H: int, W: int, C: int,
                           dtype_str: str = "bfloat16") -> bool:
    """True iff the backward kernel COMPILES for this exact shape on the
    current backend (AOT probe, cached in-process and on disk — same scheme
    as `grid_attention_pallas_t.attn_kernel_feasible`)."""
    if not dwconv3x3_bwd_fits(B, H, W, C, jnp.dtype(dtype_str).itemsize):
        return False
    if jax.default_backend() != "tpu":
        return True
    from outgridvit_tpu.ops.probe_cache import cached_probe

    def loss(x, w9):
        return jnp.sum(dwconv3x3(x, w9).astype(jnp.float32))

    dt = jnp.dtype(dtype_str)
    sx = jax.ShapeDtypeStruct((B, H, W, C), dt)
    sw = jax.ShapeDtypeStruct((9, C), dt)
    return cached_probe(
        f"tpu:dwb:{B}:{H}:{W}:{C}:{dtype_str}",
        lambda: jax.jit(jax.grad(loss, argnums=(0, 1))).lower(
            sx, sw).compile())


def _bwd_pallas(x, dy, w9):
    """x, dy: [B, H, W, C]; w9: [9, C] -> (dx [B,H,W,C], dw [9, C] fp32)."""
    B, H, W, C = x.shape
    S = H * W
    import os

    budget = int(os.environ.get("OUTGRIDVIT_DWB_KIB", 13312)) * 1024
    ct = _pick_ct(C, S, x.dtype.itemsize, budget)
    if ct == 0:
        raise ValueError(f"dwconv3x3 bwd kernel infeasible for {x.shape}")
    xf = x.reshape(B, S, C)
    dyf = dy.reshape(B, S, C)
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, W=W),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, C), x.dtype),
            jax.ShapeDtypeStruct((9, C), jnp.float32),
        ),
        grid=(C // ct, B),
        in_specs=[
            pl.BlockSpec((1, S, ct), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, ct), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ct), lambda c, b: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, S, ct), lambda c, b: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ct), lambda c, b: (0, c),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * 9 * B * S * C,
            bytes_accessed=4 * B * S * C * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xf, dyf, jnp.asarray(w9))
    return dx.reshape(B, H, W, C), dw


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def dwconv3x3(x, w9):
    """Depthwise 3x3, stride 1, SAME zero padding. x: [B,H,W,C] (compute
    dtype), w9: [9, C]. Forward = XLA's conv (it is already efficient);
    backward = the fused one-pass Pallas kernel above."""
    return _dw_fwd_conv(x, w9)


def _dw_fwd_conv(x, w9):
    C = x.shape[-1]
    k = w9.reshape(3, 3, 1, C)
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def _dw_fwd_vjp(x, w9):
    return _dw_fwd_conv(x, w9), (x, w9)


def _dw_bwd_vjp(res, dy):
    x, w9 = res
    dx, dw = _bwd_pallas(x, dy, w9)
    return dx, dw.astype(w9.dtype)


dwconv3x3.defvjp(_dw_fwd_vjp, _dw_bwd_vjp)
