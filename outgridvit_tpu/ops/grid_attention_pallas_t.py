"""Lane-batched grid MHSA for TINY grids (transposed layout, Pallas TPU).

The row-layout kernel (:mod:`outgridvit_tpu.ops.grid_attention_pallas`)
handles tiny grids (N=4 tokens in stages 1-3 of Model A) by packing P grids
into one masked 32-token attention: the MXU then sees reasonable shapes, but
7/8 of the logit FLOPs are masked waste, the fp32 [PN, PN] intermediates cap
the VMEM tile size, and — the real cost — Pallas's mandatory row-major
layout puts C on the 128-lane dim (C=96 pads to 128) and forces layout
copies at the kernel boundary, because XLA stores these tensors with the
huge group dim on lanes.

This kernel instead puts the GROUP dim on lanes and computes the N x N
attention entirely on the VPU, fully unrolled over (token, token) pairs:

    logits[n,m,g] = sum_d q[d,n,g] k[d,m,g]   (elementwise mul +
                                               8-granular sublane reduce)

Layout: qkv is passed as [N*3C, G] (token-major channels on sublanes —
N*3C is always a multiple of 8 — groups on lanes). No mask, no padding, no
masked FLOPs, and the logical transpose at the boundary matches the
physical form XLA already prefers for these arrays (profiled layouts like
``{0,2,1:T(8,128)}``: group dim minor).

Only sensible for small N (ops unroll as N^2 per head); the module-level
dispatch uses it for N <= 8 and the row-layout MXU kernel otherwise.

Numerics: fp32 logits/softmax with max-subtraction, matching the row-layout
kernel; backward is a recompute-style second kernel via ``jax.custom_vjp``.
Reference semantics: `src/model/grid_attention.py:33-89`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qkv_slab(x, n, off, hd, C3):
    """Token-n slab rows [n*3C + off, +hd) -> [hd, gt]."""
    return x[n * C3 + off: n * C3 + off + hd, :]


def _softmax_rows(lg, N):
    """lg: list of N*N [1, gt] fp32 logit rows -> attention rows a[n][m]."""
    a = []
    for n in range(N):
        rows = lg[n * N: (n + 1) * N]
        m = rows[0]
        for r in rows[1:]:
            m = jnp.maximum(m, r)
        es = [jnp.exp(r - m) for r in rows]
        den = es[0]
        for e in es[1:]:
            den = den + e
        inv = 1.0 / den
        a.append([e * inv for e in es])
    return a


def _fwd_kernel(qkv_ref, o_ref, *, N: int, heads: int, hd: int,
                scale: float):
    x = qkv_ref[...]  # [N*3C, gt]
    C = heads * hd
    C3 = 3 * C
    for h in range(heads):
        qo, ko, vo = h * hd, C + h * hd, 2 * C + h * hd
        q = [_qkv_slab(x, n, qo, hd, C3).astype(jnp.float32)
             for n in range(N)]
        k = [_qkv_slab(x, n, ko, hd, C3).astype(jnp.float32)
             for n in range(N)]
        v = [_qkv_slab(x, n, vo, hd, C3).astype(jnp.float32)
             for n in range(N)]
        lg = [jnp.sum(q[n] * k[m], axis=0, keepdims=True) * scale
              for n in range(N) for m in range(N)]
        a = _softmax_rows(lg, N)
        for n in range(N):
            out = a[n][0] * v[0]
            for m in range(1, N):
                out = out + a[n][m] * v[m]
            o_ref[n * C + h * hd: n * C + (h + 1) * hd, :] = (
                out.astype(o_ref.dtype))


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, N: int, heads: int, hd: int,
                scale: float):
    x = qkv_ref[...]
    do = do_ref[...]  # [N*C, gt]
    C = heads * hd
    C3 = 3 * C
    for h in range(heads):
        qo, ko, vo = h * hd, C + h * hd, 2 * C + h * hd
        q = [_qkv_slab(x, n, qo, hd, C3).astype(jnp.float32)
             for n in range(N)]
        k = [_qkv_slab(x, n, ko, hd, C3).astype(jnp.float32)
             for n in range(N)]
        v = [_qkv_slab(x, n, vo, hd, C3).astype(jnp.float32)
             for n in range(N)]
        g = [do[n * C + h * hd: n * C + (h + 1) * hd, :].astype(jnp.float32)
             for n in range(N)]
        lg = [jnp.sum(q[n] * k[m], axis=0, keepdims=True) * scale
              for n in range(N) for m in range(N)]
        a = _softmax_rows(lg, N)
        # dp[n][m] = sum_d do[d,n] v[d,m]
        dp = [[jnp.sum(g[n] * v[m], axis=0, keepdims=True)
               for m in range(N)] for n in range(N)]
        # da = a * (dp - sum_m dp*a) ; rowsum per n
        da = []
        for n in range(N):
            s = dp[n][0] * a[n][0]
            for m in range(1, N):
                s = s + dp[n][m] * a[n][m]
            da.append([a[n][m] * (dp[n][m] - s) for m in range(N)])
        for n in range(N):
            dq = da[n][0] * k[0]
            for m in range(1, N):
                dq = dq + da[n][m] * k[m]
            dqkv_ref[n * C3 + qo: n * C3 + qo + hd, :] = (
                (dq * scale).astype(dqkv_ref.dtype))
        for m in range(N):
            dk = da[0][m] * q[0]
            dv = a[0][m] * g[0]
            for n in range(1, N):
                dk = dk + da[n][m] * q[n]
                dv = dv + a[n][m] * g[n]
            dqkv_ref[m * C3 + ko: m * C3 + ko + hd, :] = (
                (dk * scale).astype(dqkv_ref.dtype))
            dqkv_ref[m * C3 + vo: m * C3 + vo + hd, :] = (
                dv.astype(dqkv_ref.dtype))


def _fwd_kernel_h(qkv_ref, o_ref, *, N: int, hd: int, scale: float):
    """Single-head block: qkv_ref [1, N*3hd, gt] (rows = token-major
    (n, q|k|v, d)), o_ref [1, N*hd, gt]."""
    x = qkv_ref[0]
    C3 = 3 * hd
    q = [x[n * C3: n * C3 + hd, :].astype(jnp.float32) for n in range(N)]
    k = [x[n * C3 + hd: n * C3 + 2 * hd, :].astype(jnp.float32)
         for n in range(N)]
    v = [x[n * C3 + 2 * hd: n * C3 + 3 * hd, :].astype(jnp.float32)
         for n in range(N)]
    lg = [jnp.sum(q[n] * k[m], axis=0, keepdims=True) * scale
          for n in range(N) for m in range(N)]
    a = _softmax_rows(lg, N)
    for n in range(N):
        out = a[n][0] * v[0]
        for m in range(1, N):
            out = out + a[n][m] * v[m]
        o_ref[0, n * hd: (n + 1) * hd, :] = out.astype(o_ref.dtype)


def _bwd_kernel_h(qkv_ref, do_ref, dqkv_ref, *, N: int, hd: int,
                  scale: float):
    x = qkv_ref[0]
    do = do_ref[0]  # [N*hd, gt]
    C3 = 3 * hd
    q = [x[n * C3: n * C3 + hd, :].astype(jnp.float32) for n in range(N)]
    k = [x[n * C3 + hd: n * C3 + 2 * hd, :].astype(jnp.float32)
         for n in range(N)]
    v = [x[n * C3 + 2 * hd: n * C3 + 3 * hd, :].astype(jnp.float32)
         for n in range(N)]
    g = [do[n * hd: (n + 1) * hd, :].astype(jnp.float32) for n in range(N)]
    lg = [jnp.sum(q[n] * k[m], axis=0, keepdims=True) * scale
          for n in range(N) for m in range(N)]
    a = _softmax_rows(lg, N)
    dp = [[jnp.sum(g[n] * v[m], axis=0, keepdims=True) for m in range(N)]
          for n in range(N)]
    da = []
    for n in range(N):
        s = dp[n][0] * a[n][0]
        for m in range(1, N):
            s = s + dp[n][m] * a[n][m]
        da.append([a[n][m] * (dp[n][m] - s) for m in range(N)])
    for n in range(N):
        dq = da[n][0] * k[0]
        for m in range(1, N):
            dq = dq + da[n][m] * k[m]
        dqkv_ref[0, n * C3: n * C3 + hd, :] = (
            (dq * scale).astype(dqkv_ref.dtype))
    for m in range(N):
        dk = da[0][m] * q[0]
        dv = a[0][m] * g[0]
        for n in range(1, N):
            dk = dk + da[n][m] * q[n]
            dv = dv + a[n][m] * g[n]
        dqkv_ref[0, m * C3 + hd: m * C3 + 2 * hd, :] = (
            (dk * scale).astype(dqkv_ref.dtype))
        dqkv_ref[0, m * C3 + 2 * hd: m * C3 + 3 * hd, :] = (
            dv.astype(dqkv_ref.dtype))


def _env_kib(name: str, default_kib: int) -> int:
    import os

    try:
        return int(os.environ.get(name, default_kib))
    except ValueError:
        return default_kib


def _pick_lanes(G: int, rows: int, f32_rows: int, itemsize: int,
                budget: int):
    """Lane-tile size under the 16 MiB scoped-VMEM limit. ``rows`` counts
    the double-buffered bf16 block rows; ``f32_rows`` the kernel's unrolled
    fp32 intermediates (q/k/v casts, logit+attention rows), which live on
    the Mosaic stack and count against the same budget."""
    per_lane = 2 * rows * itemsize + 4 * f32_rows
    gt = max(128, budget // max(1, per_lane))
    gt = min(gt, G, 8192)
    gt -= gt % 128
    while gt > 128 and G % gt != 0:
        gt -= 128
    if gt < 128 or G % gt != 0:
        gt = G
    return gt


# Compile-probe verdict cache — shared across all kernel families
# (ops/probe_cache.py); re-exported here for the existing import sites.
from outgridvit_tpu.ops.probe_cache import (  # noqa: F401,E402
    _probe_disk_load,
    _probe_disk_save,
)


@functools.lru_cache(maxsize=None)
def attn_kernel_feasible(kind: str, G: int, N: int, C: int, heads: int,
                         dtype_str: str = "bfloat16") -> bool:
    """True iff the `kind` lane-batched kernel ("t" full-C, "th"
    head-chunked) COMPILES — forward and backward — for this exact shape on
    the current backend.

    Replaces round 2's one-point VMEM extrapolation (`attn_t_fits`,
    anchored on a single measured shape after the live OOM fixed in commit
    a336fd5): the verdict now comes from the compiler itself via an AOT
    ``jit(grad(...)).lower().compile()`` of the exact kernel that would run.
    Scoped VMEM is budgeted per kernel, so a standalone compile reflects
    in-context feasibility. Verdicts are cached in-process and on disk
    (``OUTGRIDVIT_PROBE_CACHE``) — the probe compiles once per shape per
    machine (a few seconds), not per run."""
    import jax

    from outgridvit_tpu.ops.probe_cache import cached_probe

    if jax.default_backend() != "tpu":
        return True  # interpret/test paths have no scoped-VMEM ceiling
    fn = {"t": grid_mhsa_pallas_t, "th": grid_mhsa_pallas_th}[kind]

    def loss(x):
        return jnp.sum(fn(x, heads).astype(jnp.float32))

    spec = jax.ShapeDtypeStruct((G, N, 3 * C), jnp.dtype(dtype_str))
    # The VMEM tile budgets change the compiled kernel, so they are part
    # of the verdict's identity — without them a cached "feasible" from
    # the default budget lets an oversized override (e.g.
    # OUTGRIDVIT_ATTN_T_BWD_KIB=14336, whose bwd stack needs 21.2 MiB of
    # the chip's 16 MiB scoped VMEM) crash the real compile instead of
    # falling back to the block-packed kernel.
    return cached_probe(
        f"tpu:{kind}:{G}:{N}:{C}:{heads}:{dtype_str}:"
        f"{_env_kib('OUTGRIDVIT_ATTN_T_FWD_KIB', 10240)}:"
        f"{_env_kib('OUTGRIDVIT_ATTN_T_BWD_KIB', 10240)}",
        lambda: jax.jit(jax.grad(loss)).lower(spec).compile())


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def grid_mhsa_pallas_t(qkv: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Lane-batched tiny-grid MHSA. qkv: [Bgrp, N, 3C] -> [Bgrp, N, C].

    Same interface/semantics as ``grid_mhsa_pallas``; use for N <= 8.
    """
    return _fwd(qkv, heads)


def _fwd(qkv, heads):
    G, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    scale = hd**-0.5
    xt = qkv.transpose(1, 2, 0).reshape(N * C3, G)
    gt = _pick_lanes(G, N * C3 + N * C, 3 * C + 2 * N * N + 2 * C,
                     qkv.dtype.itemsize,
                     _env_kib("OUTGRIDVIT_ATTN_T_FWD_KIB", 10240) * 1024)
    ot = pl.pallas_call(
        functools.partial(_fwd_kernel, N=N, heads=heads, hd=hd, scale=scale),
        out_shape=jax.ShapeDtypeStruct((N * C, G), qkv.dtype),
        grid=(G // gt,),
        in_specs=[pl.BlockSpec((N * C3, gt), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N * C, gt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * N * N * C,
            bytes_accessed=G * N * 4 * C * qkv.dtype.itemsize,
            transcendentals=G * N * N * heads,
        ),
    )(xt)
    return ot.reshape(N, C, G).transpose(2, 0, 1)


def _fwd_vjp(qkv, heads):
    return _fwd(qkv, heads), (qkv,)


def _bwd_vjp(heads, res, do):
    (qkv,) = res
    G, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    scale = hd**-0.5
    xt = qkv.transpose(1, 2, 0).reshape(N * C3, G)
    dot = do.transpose(1, 2, 0).reshape(N * C, G)
    gt = _pick_lanes(G, 2 * N * C3 + N * C, 4 * C + 4 * N * N + 3 * C,
                     qkv.dtype.itemsize,
                     _env_kib("OUTGRIDVIT_ATTN_T_BWD_KIB", 10240) * 1024)
    dxt = pl.pallas_call(
        functools.partial(_bwd_kernel, N=N, heads=heads, hd=hd, scale=scale),
        out_shape=jax.ShapeDtypeStruct((N * C3, G), qkv.dtype),
        grid=(G // gt,),
        in_specs=[
            pl.BlockSpec((N * C3, gt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N * C, gt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N * C3, gt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=10 * G * N * N * C,
            bytes_accessed=G * N * 8 * C * qkv.dtype.itemsize,
            transcendentals=G * N * N * heads,
        ),
    )(xt, dot)
    return (dxt.reshape(N, C3, G).transpose(2, 0, 1),)


grid_mhsa_pallas_t.defvjp(_fwd_vjp, _bwd_vjp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def grid_mhsa_pallas_th(qkv: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Head-chunked lane-batched tiny-grid MHSA: qkv [Bgrp, N, 3C] ->
    [Bgrp, N, C].

    Same math as :func:`grid_mhsa_pallas_t`, but the Pallas grid iterates
    over heads, so each program's block is ``1/heads`` the size: the
    double-buffered io blocks are what overflow scoped VMEM for wide-C N=16
    shapes (measured 22.86 MiB at N=16 C=256 — the 64px configs' stages),
    and per-head blocks bring them back under the ceiling for every shipped
    shape. Costs one head-major transpose at each boundary; wins over the
    block-packed MXU fallback whenever the full-C kernel is infeasible.
    Reference semantics: `src/model/grid_attention.py:33-89`.
    """
    return _fwd_h(qkv, heads)


def _fwd_h(qkv, heads):
    G, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    scale = hd**-0.5
    # head-major rows (n, q|k|v, d), heads leading: [heads, N*3hd, G]
    xt = qkv.reshape(G, N, 3, heads, hd).transpose(3, 1, 2, 4, 0).reshape(
        heads, N * 3 * hd, G)
    # fp32 stack: q/k/v casts (3*N*hd rows) + the one-row [1, gt] logit and
    # attention intermediates — each PADS TO 8 SUBLANES (2*N*N arrays x 8
    # rows; at N=16 this padding, not the io blocks, dominates the budget)
    gt = _pick_lanes(G, N * 3 * hd + N * hd,
                     3 * N * hd + hd + 8 * 2 * N * N,
                     qkv.dtype.itemsize,
                     _env_kib("OUTGRIDVIT_ATTN_T_FWD_KIB", 10240) * 1024)
    ot = pl.pallas_call(
        functools.partial(_fwd_kernel_h, N=N, hd=hd, scale=scale),
        out_shape=jax.ShapeDtypeStruct((heads, N * hd, G), qkv.dtype),
        grid=(heads, G // gt),
        in_specs=[pl.BlockSpec((1, N * 3 * hd, gt), lambda h, i: (h, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N * hd, gt), lambda h, i: (h, 0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * N * N * C,
            bytes_accessed=G * N * 4 * C * qkv.dtype.itemsize,
            transcendentals=G * N * N * heads,
        ),
    )(xt)
    return ot.reshape(heads, N, hd, G).transpose(3, 1, 0, 2).reshape(G, N, C)


def _fwd_h_vjp(qkv, heads):
    return _fwd_h(qkv, heads), (qkv,)


def _bwd_h_vjp(heads, res, do):
    (qkv,) = res
    G, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    scale = hd**-0.5
    xt = qkv.reshape(G, N, 3, heads, hd).transpose(3, 1, 2, 4, 0).reshape(
        heads, N * 3 * hd, G)
    dot = do.reshape(G, N, heads, hd).transpose(2, 1, 3, 0).reshape(
        heads, N * hd, G)
    # q/k/v/g casts (4*N*hd rows) + lg/a/dp/da one-row arrays, 8-sublane
    # padded (4*N*N x 8 rows — the dominant term at N=16)
    gt = _pick_lanes(G, 2 * N * 3 * hd + N * hd,
                     4 * N * hd + 3 * hd + 8 * 4 * N * N,
                     qkv.dtype.itemsize,
                     _env_kib("OUTGRIDVIT_ATTN_T_BWD_KIB", 10240) * 1024)
    dxt = pl.pallas_call(
        functools.partial(_bwd_kernel_h, N=N, hd=hd, scale=scale),
        out_shape=jax.ShapeDtypeStruct((heads, N * 3 * hd, G), qkv.dtype),
        grid=(heads, G // gt),
        in_specs=[
            pl.BlockSpec((1, N * 3 * hd, gt), lambda h, i: (h, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N * hd, gt), lambda h, i: (h, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N * 3 * hd, gt), lambda h, i: (h, 0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=10 * G * N * N * C,
            bytes_accessed=G * N * 8 * C * qkv.dtype.itemsize,
            transcendentals=G * N * N * heads,
        ),
    )(xt, dot)
    return (dxt.reshape(heads, N, 3, hd, G).transpose(4, 1, 2, 0, 3).reshape(
        G, N, C3),)


grid_mhsa_pallas_th.defvjp(_fwd_h_vjp, _bwd_h_vjp)
