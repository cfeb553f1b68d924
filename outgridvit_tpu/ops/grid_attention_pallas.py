"""Fused Pallas TPU kernel for grid multi-head self-attention.

Motivation (profiled, see git history): the model's dominant cost is grid
attention over MANY tiny grids — e.g. stage 0 of Model A-7M at 32px/bs1024 is
65,536 independent grids of N=16 tokens with head_dim 24. XLA lowers this to
degenerate [65536, 2, 16, 16] dot_generals, three layout copies of the qkv
tensor, and an fp32 attention materialization in HBM — ~54% of the train step.

This kernel takes pre-partitioned qkv ``[Bgrp, N, 3C]`` (one XLA transpose,
which XLA does efficiently) and computes softmax(q k^T / sqrt(hd)) v for all
heads of a tile of grids entirely in VMEM: no HBM intermediates, fp32 softmax
in registers. The backward pass is a second Pallas kernel (recompute-style:
attention is recomputed from qkv, then dq/dk/dv via the standard softmax-VJP
identity), wired up with ``jax.custom_vjp``.

Both kernels flatten (tile, token) into the sublane dimension and keep
channels in lanes, so elementwise work is well-shaped; the tiny matmuls are
batched ``dot_general``s that Mosaic unrolls in-registers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_tile(qkv, heads: int, scale: float):
    """qkv: [bt, N, 3C] -> out [bt, N, C]; all in registers/VMEM.

    Heads are addressed by lane slices (Mosaic cannot shape-cast the lane
    dim into [heads, hd]); the static python loop over heads unrolls."""
    bt, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    outs = []
    for h in range(heads):
        qh = qkv[:, :, h * hd : (h + 1) * hd]
        kh = qkv[:, :, C + h * hd : C + (h + 1) * hd]
        vh = qkv[:, :, 2 * C + h * hd : 2 * C + (h + 1) * hd]
        logits = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [bt, N, N] fp32
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        a = e / jnp.sum(e, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            a.astype(qkv.dtype), vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(qkv.dtype)  # [bt, N, hd]
        outs.append(oh)
    return jnp.concatenate(outs, axis=-1)  # [bt, N, C]


def _fwd_kernel(qkv_ref, o_ref, *, heads: int, scale: float):
    o_ref[...] = _attn_tile(qkv_ref[...], heads, scale)


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, heads: int, scale: float):
    """Recompute attention, then the softmax-VJP backward:
    dv = a^T do ; dp = do v^T ; da = a * (dp - sum(dp*a)) ; dq = da k * s ;
    dk = da^T q * s."""
    qkv = qkv_ref[...]
    do = do_ref[...]
    bt, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    dqs, dks, dvs = [], [], []
    bd = (((2,), (2,)), ((0,), (0,)))  # contract last, batch first
    for h in range(heads):
        qh = qkv[:, :, h * hd : (h + 1) * hd]
        kh = qkv[:, :, C + h * hd : C + (h + 1) * hd]
        vh = qkv[:, :, 2 * C + h * hd : 2 * C + (h + 1) * hd]
        doh = do[:, :, h * hd : (h + 1) * hd].astype(jnp.float32)
        logits = jax.lax.dot_general(
            qh, kh, dimension_numbers=bd, preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        a = e / jnp.sum(e, axis=-1, keepdims=True)  # [bt, N, N] f32

        # dv[m,d] = sum_n a[n,m] do[n,d]  -> contract over n
        dv = jax.lax.dot_general(
            a, doh,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bt, N(m), hd]
        # dp[n,m] = sum_d do[n,d] v[m,d]
        dp = jax.lax.dot_general(
            doh, vh.astype(jnp.float32),
            dimension_numbers=bd, preferred_element_type=jnp.float32,
        )  # [bt, N, N]
        da = a * (dp - jnp.sum(dp * a, axis=-1, keepdims=True))  # [bt, N, N]
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


def _pick_tile(Bgrp: int, N: int, C: int, dtype, vmem_budget=1536 * 1024):
    """Tile size over the grid-group dim.

    Budget counts the resident block (qkv in + out, double-buffered by the
    pipeline) plus the fp32 logits/softmax intermediates the kernel body
    materializes per head; the default keeps total stack < ~12 MB."""
    per_group = 2 * (N * 3 * C + N * C) * dtype.itemsize + N * N * 4 * 3
    bt = max(1, vmem_budget // max(1, per_group))
    bt = min(bt, Bgrp, 2048)
    while Bgrp % bt != 0:
        bt -= 1
    return bt


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def grid_mhsa_pallas(qkv: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Fused grid MHSA. qkv: [Bgrp, N, 3C] -> [Bgrp, N, C]."""
    return _fwd(qkv, heads)


def _fwd(qkv, heads):
    Bgrp, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    scale = hd**-0.5
    bt = _pick_tile(Bgrp, N, C, qkv.dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((Bgrp, N, C), qkv.dtype),
        grid=(Bgrp // bt,),
        in_specs=[
            pl.BlockSpec((bt, N, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(qkv)


def _fwd_vjp(qkv, heads):
    return _fwd(qkv, heads), (qkv,)


def _bwd_vjp(heads, res, do):
    (qkv,) = res
    Bgrp, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    scale = hd**-0.5
    # the backward body holds ~2.5x the forward's intermediates per group
    bt = _pick_tile(Bgrp, N, C, qkv.dtype, vmem_budget=640 * 1024)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((Bgrp, N, C3), qkv.dtype),
        grid=(Bgrp // bt,),
        in_specs=[
            pl.BlockSpec((bt, N, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, N, C3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(qkv, do)
    return (dqkv,)


grid_mhsa_pallas.defvjp(_fwd_vjp, _bwd_vjp)
