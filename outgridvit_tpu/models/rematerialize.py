"""Opt-in per-block rematerialization (gradient checkpointing).

The 64px configs are HBM-bandwidth-bound, not FLOPs-bound
(docs/PERFORMANCE.md): the backward pass reads every saved block
intermediate back from HBM. Wrapping each block in ``jax.checkpoint``
saves only the block *inputs* and recomputes the internals inside the
backward fusion — trading cheap recompute FLOPs for HBM traffic. This is
a TPU-native knob with no reference counterpart (the reference is a
single-GPU torch codebase with no activation checkpointing,
`src/training/one_epoch_train.py`).

``prevent_cse=False`` is used because the production dispatch scans K
steps per XLA program (`training/steps.py:make_train_superstep`), where
CSE cannot undo rematerialization; it is also the recommended setting on
TPU for performance.

Select with the ``model.remat`` YAML key or ``OUTGRIDVIT_REMAT``:
  - ``nothing``  — save only block inputs (maximal recompute)
  - ``dots``     — save matmul/conv outputs, recompute elementwise chains
  - ``dots_no_batch`` — save only matmul outputs with no batch dims
    (weight-shaped tensors); activations recomputed
  - ``off``      — explicitly disabled. A falsy YAML value (``remat:
    false`` / ``''`` / ``0`` / ``null``) resolves to this sentinel, so
    the config can force remat off even when an ambient
    ``OUTGRIDVIT_REMAT`` is set (the YAML key always wins).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from flax import linen as nn

_POLICIES = {
    # None = jax.checkpoint's default: nothing saveable
    "nothing": None,
    "dots": "dots_saveable",
    "dots_no_batch": "dots_with_no_batch_dims_saveable",
}


def remat_policy(name: str):
    """Resolve a policy name to a jax.checkpoint policy (or None)."""
    key = str(name).strip().lower()
    if key not in _POLICIES:
        raise ValueError(
            f"Unknown remat policy '{name}'; choose from {sorted(_POLICIES)}"
        )
    attr = _POLICIES[key]
    return None if attr is None else getattr(jax.checkpoint_policies, attr)


def env_remat() -> Optional[str]:
    """The process-default remat mode (OUTGRIDVIT_REMAT; '' / '0' = off)."""
    v = os.environ.get("OUTGRIDVIT_REMAT", "").strip()
    return v if v and v != "0" else None


# Values of the YAML/env knob that mean "explicitly disabled". "off" is a
# truthy string, so it survives the models' trace-time `self.remat or
# env_remat()` fallback and still disables remat here.
_OFF_SENTINELS = frozenset({"off", "none", "false", "0", ""})


def maybe_remat(block_cls, remat: Optional[str], static_argnums):
    """Wrap a linen block class in lifted remat when ``remat`` is set.

    ``static_argnums`` index the block's ``__call__`` args with the module
    itself at 0 (so the first static bool after ``x`` is 2); callers must
    pass those args positionally.
    """
    if not remat or str(remat).strip().lower() in _OFF_SENTINELS:
        return block_cls
    return nn.remat(
        block_cls,
        policy=remat_policy(remat),
        prevent_cse=False,
        static_argnums=tuple(static_argnums),
    )
