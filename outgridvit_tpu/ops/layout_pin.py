"""Explicit XLA layout pinning at Pallas-kernel boundaries (opt-in A/B knob).

At the 64px stage-0 geometry the profiled train step spends ~17.5 ms in pure
layout copies (docs/PERFORMANCE.md "Remaining 64px tail"): XLA prefers
group-minor layouts for small-channel tensors while every ``pallas_call``
boundary demands the default row-major (descending minor-to-major) layout,
so the 6-D ``grid_partition`` transpose can materialize once in XLA's chosen
layout and a second time in the kernel's. ``pin_default(x)`` inserts a
``jax.experimental.layout.with_layout_constraint`` forcing the default
layout at the annotated point, letting XLA's layout-assignment pass fold the
transpose directly into a single default-layout copy.

This mirrors the role of torch's ``contiguous()``/``channels_last`` hints in
the reference's CUDA world (the reference itself needs none — cuDNN owns its
layouts; see `/root/reference/src/model/grid_attention.py:93-131` for the
partition the pins bracket here).

Env knob: ``OUTGRIDVIT_PIN_LAYOUT=1`` enables the pins. Default OFF —
same-window A/B results are recorded in docs/evidence/campaign_r5/ and
docs/PERFORMANCE.md.
"""

from __future__ import annotations

import os

import jax

__all__ = ["pin_enabled", "pin_default"]


def pin_enabled() -> bool:
    return os.environ.get("OUTGRIDVIT_PIN_LAYOUT", "0") in ("1", "true")


def pin_default(x):
    """Constrain ``x`` to the default (row-major) layout when the pin knob
    is on and we are on TPU; identity otherwise. Safe under grad/vmap/scan
    (the constraint is an identity with a layout annotation)."""
    if not pin_enabled():
        return x
    try:
        if jax.default_backend() != "tpu":
            return x
        from jax.experimental.layout import Layout, with_layout_constraint

        return with_layout_constraint(
            x, Layout(major_to_minor=tuple(range(x.ndim))))
    except Exception:
        return x
