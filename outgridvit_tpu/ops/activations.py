"""Activation registry.

Mirrors the reference's activation surface (`src/model/outlook_attention.py:6-14`:
silu | relu | gelu). GELU is the *exact* (erf) variant because torch ``nn.GELU()``
defaults to exact; flax's default is the tanh approximation, which would break
<=1e-4 logits parity.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from flax import linen as nn


def make_activation(act: str):
    """Memoized so repeated lookups return the SAME callable — fused Pallas
    branches close over the activation and key their custom-vjp tracing on
    its identity. Name is normalized BEFORE the cache so 'GELU' and 'gelu'
    share one callable (one retrace)."""
    return _make_activation(act.lower())


@functools.lru_cache(maxsize=None)
def _make_activation(act: str):
    if act == "silu":
        return nn.silu
    if act == "relu":
        return nn.relu
    if act == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"Unknown activation '{act}'. Use one of: silu|gelu|relu")


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return nn.sigmoid(x)
