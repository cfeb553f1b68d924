"""Multi-head self-attention as a pure function on token sequences.

Matches the reference MHSA math (`src/model/grid_attention.py:62-89`): fused
qkv projection happens in the calling module; this function takes q/k/v and
runs scaled dot-product attention. Logits and softmax are computed in fp32 for
bf16 stability (the MXU accumulates in fp32 via ``preferred_element_type``),
then cast back for the value matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mhsa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    return_attn: bool = False,
):
    """Scaled dot-product attention.

    Args:
      q, k, v: ``[B, heads, N, head_dim]``.
    Returns:
      out ``[B, heads, N, head_dim]`` (and the fp32 attention matrix if
      ``return_attn`` — used by the analysis subsystem, reference
      `grid_attention.py:77-83`).
    """
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd",
        attn.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    if return_attn:
        return out, attn
    return out
