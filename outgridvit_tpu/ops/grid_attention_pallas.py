"""Fused Pallas TPU kernel for grid multi-head self-attention.

Motivation (profiled, see git history): the model's dominant cost is grid
attention over MANY tiny grids — e.g. stage 0 of Model A-7M at 32px/bs1024 is
65,536 independent grids of N=16 tokens with head_dim 24 (stage 1: N=4!). XLA
lowers this to degenerate [65536, 2, 16, 16] dot_generals, three layout
copies of the qkv tensor, and an fp32 attention materialization in HBM —
~54% of the train step.

This kernel takes pre-partitioned qkv ``[Bgrp, N, 3C]`` (one XLA transpose,
which XLA does efficiently) and computes softmax(q k^T / sqrt(hd)) v for all
heads of a tile of grids entirely in VMEM: no HBM intermediates, fp32 softmax
in registers.

Two hardware tricks:
- **Block-diagonal grid packing**: ``P = 128 // N`` grids are packed into one
  [P*N, hd] x [hd, P*N] matmul with a static block-diagonal additive mask, so
  the MXU sees 128-wide matmuls instead of N-wide ones (the extra masked
  FLOPs are free — the systolic array was idle anyway).
- Heads are addressed by lane slices (Mosaic cannot shape-cast the lane dim),
  and (tile, token) rows flatten into sublanes.

The backward pass is a second Pallas kernel (recompute-style: attention is
recomputed from qkv, then dq/dk/dv via the softmax-VJP identity), wired up
with ``jax.custom_vjp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _pick_pack(N: int) -> int:
    """How many grids to pack into one masked attention.

    Swept on a v5e (see git history): packing to 128 inflates the masked
    FLOPs faster than it improves shape (these dots are VPU/layout-bound,
    not MXU-bound); N=16 runs best unpacked, while very tiny grids (N<=8)
    win by ~1.4x when packed to 32-token rows.

    ``OUTGRIDVIT_ATTN_PACK=<P>`` overrides the choice for N>=16 shapes
    (A/B knob: the r2 sweep covered N<=16; the 64px configs run N=64,
    where packing 2 grids fills the 128-row MXU tile)."""
    if N >= 16:
        import os

        try:
            return max(1, int(os.environ.get("OUTGRIDVIT_ATTN_PACK", 1)))
        except ValueError:
            return 1
    return max(1, 32 // N)


def _block_mask(P: int, N: int) -> np.ndarray:
    """[P*N, P*N] additive mask: 0 within a grid's diagonal block, -inf off."""
    eye = np.kron(np.eye(P, dtype=np.float32), np.ones((N, N), np.float32))
    return (1.0 - eye) * _NEG


def _attn_tile(qkv, heads: int, scale: float, mask):
    """qkv: [G, PN, 3C] (P grids pre-packed outside the kernel) ->
    out [G, PN, C]; all in registers/VMEM."""
    G, PN, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    q3 = qkv
    outs = []
    for h in range(heads):
        qh = q3[:, :, h * hd : (h + 1) * hd]
        kh = q3[:, :, C + h * hd : C + (h + 1) * hd]
        vh = q3[:, :, 2 * C + h * hd : 2 * C + (h + 1) * hd]
        logits = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [G, PN, PN] fp32
        logits = logits + mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        a = e / jnp.sum(e, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            a.astype(qkv.dtype), vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(qkv.dtype)  # [G, PN, hd]
        outs.append(oh)
    return jnp.concatenate(outs, axis=-1)  # [G, PN, C]


def _fwd_kernel(mask_ref, qkv_ref, o_ref, *, heads: int, scale: float):
    o_ref[...] = _attn_tile(qkv_ref[...], heads, scale, mask_ref[...])


def _bwd_kernel(mask_ref, qkv_ref, do_ref, dqkv_ref, *, heads: int,
                scale: float):
    """Recompute attention, then the softmax-VJP backward:
    dv = a^T do ; dp = do v^T ; da = a * (dp - sum(dp*a)) ; dq = da k * s ;
    dk = da^T q * s. Masked entries have a == 0, so da == 0 there and no
    explicit masking is needed in the backward."""
    q3 = qkv_ref[...]
    do3 = do_ref[...]
    mask = mask_ref[...]
    G, PN, C3 = q3.shape
    C = C3 // 3
    hd = C // heads
    dqs, dks, dvs = [], [], []
    bd = (((2,), (2,)), ((0,), (0,)))  # contract last, batch first
    for h in range(heads):
        qh = q3[:, :, h * hd : (h + 1) * hd]
        kh = q3[:, :, C + h * hd : C + (h + 1) * hd]
        vh = q3[:, :, 2 * C + h * hd : 2 * C + (h + 1) * hd]
        doh = do3[:, :, h * hd : (h + 1) * hd].astype(jnp.float32)
        logits = jax.lax.dot_general(
            qh, kh, dimension_numbers=bd, preferred_element_type=jnp.float32
        ) * scale + mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        a = e / jnp.sum(e, axis=-1, keepdims=True)  # [G, PN, PN] f32

        # dv[m,d] = sum_n a[n,m] do[n,d]  -> contract over n
        dv = jax.lax.dot_general(
            a, doh,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dp[n,m] = sum_d do[n,d] v[m,d]
        dp = jax.lax.dot_general(
            doh, vh.astype(jnp.float32),
            dimension_numbers=bd, preferred_element_type=jnp.float32,
        )
        da = a * (dp - jnp.sum(dp * a, axis=-1, keepdims=True))
        # dq[n,d] = sum_m da[n,m] k[m,d] * scale
        dq = jax.lax.dot_general(
            da, kh.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        # dk[m,d] = sum_n da[n,m] q[n,d] * scale
        dk = jax.lax.dot_general(
            da, qh.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)

    dqkv_ref[...] = jnp.concatenate(
        dqs + dks + dvs, axis=-1
    ).astype(dqkv_ref.dtype)


def _env_budget(name: str, default_kib: int) -> int:
    import os

    try:
        return int(os.environ.get(name, default_kib))
    except ValueError:
        return default_kib


def _pick_tile(G: int, PN: int, C: int, dtype, vmem_budget: int):
    """Tile size over the packed-group dim. Budget counts the
    double-buffered blocks plus the fp32 [gt, PN, PN] intermediates
    (~3 live per head)."""
    per_group = 2 * (PN * 3 * C + PN * C) * dtype.itemsize + PN * PN * 4 * 3
    gt = max(1, vmem_budget // max(1, per_group))
    gt = min(gt, G, 512)
    while G % gt != 0:
        gt -= 1
    return gt


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def grid_mhsa_pallas(qkv: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Fused grid MHSA. qkv: [Bgrp, N, 3C] -> [Bgrp, N, C]."""
    return _fwd(qkv, heads)


def _fwd(qkv, heads):
    Bgrp, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    scale = hd**-0.5
    P = _pick_pack(N)
    while Bgrp % P != 0 and P > 1:
        P //= 2
    G, PN = Bgrp // P, P * N
    gt = _pick_tile(G, PN, C, qkv.dtype,
                    vmem_budget=int(_env_budget("OUTGRIDVIT_ATTN_FWD_KIB",
                                                3072)) * 1024)
    mask = jnp.asarray(_block_mask(P, N))
    qkv2 = qkv.reshape(G, PN, C3)  # free: contiguous merge of P grids
    out2 = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((G, PN, C), qkv.dtype),
        grid=(G // gt,),
        in_specs=[
            pl.BlockSpec((PN, PN), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, PN, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gt, PN, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * PN * PN * hd * heads,
            bytes_accessed=G * PN * 4 * C * qkv.dtype.itemsize,
            transcendentals=G * PN * PN * heads,
        ),
    )(mask, qkv2)
    return out2.reshape(Bgrp, N, C)


def _fwd_vjp(qkv, heads):
    return _fwd(qkv, heads), (qkv,)


def _bwd_vjp(heads, res, do):
    (qkv,) = res
    Bgrp, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    scale = hd**-0.5
    P = _pick_pack(N)
    while Bgrp % P != 0 and P > 1:
        P //= 2
    G, PN = Bgrp // P, P * N
    # the backward body holds ~3x the forward's intermediates per group
    gt = _pick_tile(G, PN, C, qkv.dtype,
                    vmem_budget=int(_env_budget("OUTGRIDVIT_ATTN_BWD_KIB",
                                                1024)) * 1024)
    mask = jnp.asarray(_block_mask(P, N))
    qkv2 = qkv.reshape(G, PN, C3)
    do2 = do.reshape(G, PN, C)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((G, PN, C3), qkv.dtype),
        grid=(G // gt,),
        in_specs=[
            pl.BlockSpec((PN, PN), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, PN, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, PN, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gt, PN, C3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=10 * G * PN * PN * hd * heads,
            bytes_accessed=G * PN * 8 * C * qkv.dtype.itemsize,
            transcendentals=G * PN * PN * heads,
        ),
    )(mask, qkv2, do2)
    return (dqkv.reshape(Bgrp, N, C3),)


grid_mhsa_pallas.defvjp(_fwd_vjp, _bwd_vjp)
