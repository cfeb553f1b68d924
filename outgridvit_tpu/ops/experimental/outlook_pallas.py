"""Fused Pallas TPU kernel for outlook attention (softmax + K^2-tap dynamic
local aggregation).

The reference materializes an unfold tensor K^2 times the value tensor
(`src/model/outlook_attention.py:113`); our XLA path avoids that with K^2
shifted multiply-accumulates but still materializes the fp32 softmax weights
and K^2 shifted slices in HBM. This kernel fuses everything for a batch tile:

  a = softmax(logits) over the K^2 taps (fp32, in registers)
  y[p] = sum_taps a[p, tap] * v[p + offset(tap)]      (zero-padded borders)

Shifts are circular rolls on the VMEM-resident tile with border masks folded
into the per-tap weights (zero-pad semantics; Mosaic cannot concatenate with
offsets on non-concat dims), so no halo exchange or HBM intermediate exists.
Backward is derived with ``jax.vjp`` through an equivalent XLA forward — a
fully in-kernel backward was measured VMEM-hostile (per-tap [bt,H,W,1] maps
pad lanes to 128).

Supports stride == 1 (the only stride the shipped models use); the module
falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(x, dy: int, dx: int):
    """Circular shift_o(x)[i, j] = x[(i+dy) % H, (j+dx) % W].

    Mosaic cannot concatenate with offsets on non-concat dims, so shifts are
    circular rolls; the wrapped (out-of-range) entries are killed by
    :func:`_border_mask`, which the callers fold into the cheap per-tap
    weight maps (zero-padding semantics, identical to F.unfold's borders)."""
    H, W = x.shape[1], x.shape[2]
    if dy != 0:
        x = pltpu.roll(x, (-dy) % H, 1)  # pltpu.roll requires shift >= 0
    if dx != 0:
        x = pltpu.roll(x, (-dx) % W, 2)
    return x


def _border_mask(H: int, W: int, dy: int, dx: int):
    """[1, H, W, 1] fp32 validity mask for shift (dy, dx): 1 where the
    source pixel (i+dy, j+dx) is in range."""
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = (row + dy >= 0) & (row + dy < H) & (col + dx >= 0) & (col + dx < W)
    return ok.astype(jnp.float32)[None, :, :, None]


def _softmax_taps(logits, heads: int, kk: int):
    """[bt, H, W, heads*kk] -> list per head of fp32 [bt, H, W, kk]."""
    out = []
    for h in range(heads):
        lh = logits[..., h * kk : (h + 1) * kk].astype(jnp.float32)
        m = jnp.max(lh, axis=-1, keepdims=True)
        e = jnp.exp(lh - m)
        out.append(e / jnp.sum(e, axis=-1, keepdims=True))
    return out


def _fwd_kernel(v_ref, l_ref, o_ref, *, heads: int, k: int):
    # Mosaic's rotate only supports 32-bit data -> shift in fp32
    v = v_ref[...].astype(jnp.float32)
    kk = k * k
    p = k // 2
    a_heads = _softmax_taps(l_ref[...], heads, kk)
    bt, H, W, C = v.shape
    hd = C // heads
    # per-head accumulators keep the live set small under full unrolling
    accs = [jnp.zeros((bt, H, W, hd), jnp.float32) for _ in range(heads)]
    for ky in range(k):
        for kx in range(k):
            tap = ky * k + kx
            vs = _shift(v, ky - p, kx - p)
            bm = _border_mask(H, W, ky - p, kx - p)
            for h in range(heads):
                w = a_heads[h][..., tap : tap + 1] * bm  # [bt,H,W,1] f32
                accs[h] = accs[h] + vs[..., h * hd : (h + 1) * hd] * w
    o_ref[...] = jnp.concatenate(accs, axis=-1).astype(o_ref.dtype)


def _bwd_kernel(v_ref, l_ref, do_ref, dv_ref, dl_ref, *, heads: int, k: int):
    v = v_ref[...].astype(jnp.float32)  # rotate needs 32-bit data
    do = do_ref[...].astype(jnp.float32)
    kk = k * k
    p = k // 2
    a_heads = _softmax_taps(l_ref[...], heads, kk)
    bt, H, W, C = v.shape
    hd = C // heads

    dvs = [jnp.zeros((bt, H, W, hd), jnp.float32) for _ in range(heads)]
    da_heads = [[] for _ in range(heads)]  # per head: kk maps [bt,H,W,1]
    for ky in range(k):
        for kx in range(k):
            tap = ky * k + kx
            bm = _border_mask(H, W, ky - p, kx - p)
            for h in range(heads):
                w = a_heads[h][..., tap : tap + 1] * bm
                doh = do[..., h * hd : (h + 1) * hd]
                vsh = _shift(v[..., h * hd : (h + 1) * hd],
                             ky - p, kx - p)
                # da[tap] = sum_d v_shift * dy, zero where the tap reaches
                # outside the map (zero-pad semantics)
                da_heads[h].append(
                    jnp.sum(vsh * doh, axis=-1, keepdims=True) * bm)
                # dv += shift^{-1}(a_masked * dy); wrapped entries carry
                # w == 0, so no second mask is needed
                dvs[h] = dvs[h] + _shift(doh * w, p - ky, p - kx)

    dls = []
    for h in range(heads):
        da = jnp.concatenate(da_heads[h], axis=-1)  # [bt, H, W, kk]
        a = a_heads[h]
        dl = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
        dls.append(dl)
    dv_ref[...] = jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)
    dl_ref[...] = jnp.concatenate(dls, axis=-1).astype(dl_ref.dtype)


def _pick_bt(B: int, H: int, W: int, C: int, heads: int, kk: int, itemsize,
             budget=4 * 1024 * 1024):
    # The unrolled tap loop keeps several shifted fp32 copies of the value
    # tile live at once (~K^2-ish in the worst case) — budget generously.
    per_img = H * W * (2 * C * itemsize + heads * kk * itemsize
                       + (kk + 3) * C * 4 + 2 * heads * kk * 4)
    bt = max(1, budget // max(1, per_img))
    bt = min(bt, B, 512)
    while B % bt != 0:
        bt -= 1
    return bt


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def outlook_attention_pallas(v, logits, heads: int, kernel_size: int = 3):
    """Fused softmax-over-taps + dynamic local aggregation, stride 1.

    Args:
      v: values ``[B, H, W, C]``.
      logits: pre-softmax tap logits ``[B, H, W, heads*K*K]``.
    Returns:
      ``[B, H, W, C]``.
    """
    return _fwd(v, logits, heads, kernel_size)


def _fwd(v, logits, heads, k):
    B, H, W, C = v.shape
    kk = k * k
    bt = _pick_bt(B, H, W, C, heads, kk, v.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, k=k),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), v.dtype),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, H, W, heads * kk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(v, logits)


def _fwd_vjp(v, logits, heads, k):
    return _fwd(v, logits, heads, k), (v, logits)


def _xla_forward(v, logits, heads, k):
    """XLA twin of the fused forward (softmax over taps + aggregation);
    used to derive the backward pass."""
    from outgridvit_tpu.ops.outlook import outlook_aggregate_xla

    B, H, W, C = v.shape
    kk = k * k
    a = logits.reshape(B, H, W, heads, kk)
    a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(v.dtype)
    return outlook_aggregate_xla(v, a, kernel_size=k, stride=1)


def _bwd_vjp(heads, k, res, do):
    # A full Pallas backward is VMEM-hostile here: the per-tap [bt,H,W,1]
    # gradient maps pad their lane dim to 128, exploding the unrolled stack.
    # XLA's VJP of the equivalent shift-based forward is already decent, so
    # the backward recomputes through it (fwd stays fused).
    v, logits = res
    _, vjp = jax.vjp(lambda vv, ll: _xla_forward(vv, ll, heads, k), v, logits)
    return vjp(do)


outlook_attention_pallas.defvjp(_fwd_vjp, _bwd_vjp)
