"""Outlook-attention aggregation (VOLO-style dynamic local aggregation), NHWC.

The reference implements this with ``F.unfold`` which materializes a
K^2-times-larger ``[B, C*K*K, H*W]`` tensor (`src/model/outlook_attention.py:113`)
— an HBM-bandwidth disaster on TPU. We never materialize the unfold:

- **XLA path** (:func:`outlook_aggregate_xla`): pad once, then K^2 static
  shifted slices, each fused by XLA into a multiply-accumulate against one
  attention tap. O(K^2) reads of ``v`` but zero extra residency.
- **Pallas path** (:mod:`outgridvit_tpu.ops.experimental.outlook_pallas`): one kernel that
  keeps a (block + halo) tile of ``v`` in VMEM and does all K^2 taps on-chip.

Semantics (bit-matched to the reference forward, `outlook_attention.py:91-124`):
``y[b, i, j, h, d] = sum_{ky,kx} v_pad[b, i*s+ky, j*s+kx, h, d] *
attn[b, i, j, h, ky*K+kx]`` with zero padding of K//2 — identical border
behavior to ``F.unfold(kernel_size=K, padding=K//2, stride=s)``; the kernel tap
ordering is row-major (ky major, kx minor) to match unfold's flattening.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _check_shapes(v: jnp.ndarray, attn: jnp.ndarray, kernel_size: int, stride: int):
    if v.ndim != 4:
        raise ValueError(f"v must be [B,H,W,C]; got {v.shape}")
    if attn.ndim != 5:
        raise ValueError(f"attn must be [B,Hs,Ws,heads,K*K]; got {attn.shape}")
    if kernel_size <= 0 or kernel_size % 2 == 0:
        raise ValueError("kernel_size must be odd and > 0 (e.g. 3, 5, 7)")
    if stride <= 0:
        raise ValueError("stride must be > 0")
    if attn.shape[-1] != kernel_size * kernel_size:
        raise ValueError(
            f"attn last dim {attn.shape[-1]} != kernel_size^2 {kernel_size**2}"
        )
    B, H, W, C = v.shape
    heads = attn.shape[3]
    if C % heads != 0:
        raise ValueError(f"C={C} must be divisible by heads={heads}")
    Hs = (H + 2 * (kernel_size // 2) - kernel_size) // stride + 1
    Ws = (W + 2 * (kernel_size // 2) - kernel_size) // stride + 1
    if attn.shape[1] != Hs or attn.shape[2] != Ws:
        raise ValueError(
            f"attn spatial {attn.shape[1:3]} inconsistent with v {v.shape[1:3]} "
            f"at stride {stride} (expected {(Hs, Ws)})"
        )
    return B, H, W, C, heads, Hs, Ws


@functools.partial(jax.jit, static_argnames=("kernel_size", "stride"))
def outlook_aggregate_xla(
    v: jnp.ndarray,
    attn: jnp.ndarray,
    kernel_size: int = 3,
    stride: int = 1,
) -> jnp.ndarray:
    """Shift-and-accumulate outlook aggregation.

    Args:
      v: values, ``[B, H, W, C]``.
      attn: attention weights (already softmaxed over the last axis),
        ``[B, Hs, Ws, heads, K*K]``.
    Returns:
      ``[B, Hs, Ws, C]``.
    """
    B, H, W, C, heads, Hs, Ws = _check_shapes(v, attn, kernel_size, stride)
    k, s, p = kernel_size, stride, kernel_size // 2
    hd = C // heads

    v_pad = jnp.pad(v, ((0, 0), (p, p), (p, p), (0, 0)))
    vh = v_pad.reshape(B, H + 2 * p, W + 2 * p, heads, hd)

    acc = jnp.zeros((B, Hs, Ws, heads, hd), dtype=jnp.promote_types(v.dtype, attn.dtype))
    for ky in range(k):
        for kx in range(k):
            tap = jax.lax.slice(
                vh,
                (0, ky, kx, 0, 0),
                (B, ky + (Hs - 1) * s + 1, kx + (Ws - 1) * s + 1, heads, hd),
                (1, s, s, 1, 1),
            )
            w = attn[..., ky * k + kx]  # [B, Hs, Ws, heads]
            acc = acc + tap * w[..., None]
    return acc.reshape(B, Hs, Ws, C).astype(v.dtype)


def outlook_aggregate(
    v: jnp.ndarray,
    attn: jnp.ndarray,
    kernel_size: int = 3,
    stride: int = 1,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Outlook aggregation entry point.

    Always the XLA shift-and-accumulate path: a fused Pallas variant
    (softmax + taps, :mod:`outgridvit_tpu.ops.experimental.outlook_pallas`) exists but
    measured slower on v5e (Mosaic rotates only 32-bit data); the module
    layer (`models/blocks.py OutlookAttention2d`) owns that dispatch.
    ``use_pallas`` is accepted for signature stability and ignored here.
    """
    del use_pallas
    return outlook_aggregate_xla(v, attn, kernel_size=kernel_size, stride=stride)
