"""MaxViT-style dilated grid partitioning (NHWC).

Semantics match the reference exactly (`src/model/grid_partition.py:3-32`):
``grid_partition`` groups pixels strided by ``g`` across the whole feature map,
so grid group (gy, gx) holds pixels (i*g+gy, j*g+gx). Pure reshape/transpose —
XLA lowers these to free layout changes when fused into the surrounding matmuls.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def grid_partition(x: jnp.ndarray, grid_size: int) -> Tuple[jnp.ndarray, tuple]:
    """[B, H, W, C] -> ([B*g*g, Hg, Wg, C], meta).

    Each output "grid" is the set of tokens at a fixed (h mod g, w mod g)
    residue — a dilated view of the full map, giving sparse global attention.
    """
    if x.ndim != 4:
        raise ValueError(f"Expected x.ndim==4 (BHWC). Got shape {tuple(x.shape)}")
    B, H, W, C = x.shape
    g = grid_size
    if g <= 0:
        raise ValueError("grid_size must be > 0")
    if (H % g) != 0 or (W % g) != 0:
        raise ValueError(
            f"H and W must be divisible by grid_size. Got H={H}, W={W}, g={g}"
        )
    Hg, Wg = H // g, W // g
    x = x.reshape(B, Hg, g, Wg, g, C)
    grids = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(B * g * g, Hg, Wg, C)
    meta = (B, H, W, C, g)
    return grids, meta


def grid_unpartition(grids: jnp.ndarray, meta: tuple) -> jnp.ndarray:
    """Inverse of :func:`grid_partition`."""
    if grids.ndim != 4:
        raise ValueError(f"Expected grids.ndim==4. Got shape {tuple(grids.shape)}")
    B, H, W, C, g = meta
    Hg, Wg = H // g, W // g
    if grids.shape[0] != B * g * g:
        raise ValueError(
            f"grids.shape[0] must be B*g*g = {B * g * g}. Got {grids.shape[0]}"
        )
    if grids.shape[1] != Hg or grids.shape[2] != Wg or grids.shape[3] != C:
        raise ValueError(
            f"grids shape mismatch. Expected (*,{Hg},{Wg},{C}) got {tuple(grids.shape)}"
        )
    x = grids.reshape(B, g, g, Hg, Wg, C)
    x = jnp.transpose(x, (0, 3, 1, 4, 2, 5)).reshape(B, H, W, C)
    return x


def window_partition(x: jnp.ndarray, window_size: int) -> Tuple[jnp.ndarray, tuple]:
    """[B, H, W, C] -> ([B*nW, w, w, C], meta): contiguous (non-dilated)
    windows — the MaxViT "block attention" counterpart of
    :func:`grid_partition`. The reference carries a ``window_size`` config
    field but never implements the mode (`grid_attention.py:101-102`); here
    it is first-class."""
    if x.ndim != 4:
        raise ValueError(f"Expected x.ndim==4 (BHWC). Got shape {tuple(x.shape)}")
    B, H, W, C = x.shape
    w = window_size
    if w <= 0:
        raise ValueError("window_size must be > 0")
    if (H % w) != 0 or (W % w) != 0:
        raise ValueError(
            f"H and W must be divisible by window_size. Got H={H}, W={W}, w={w}"
        )
    Hb, Wb = H // w, W // w
    x = x.reshape(B, Hb, w, Wb, w, C)
    wins = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B * Hb * Wb, w, w, C)
    return wins, (B, H, W, C, w)


def window_unpartition(wins: jnp.ndarray, meta: tuple) -> jnp.ndarray:
    """Inverse of :func:`window_partition`."""
    B, H, W, C, w = meta
    Hb, Wb = H // w, W // w
    x = wins.reshape(B, Hb, Wb, w, w, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, C)
    return x
