"""Optimizer + LR schedule.

Mirrors the reference trainer's optimizer semantics
(`src/training/train_full_model.py:56-66`, `src/training/warmup.py`):
AdamW(betas=(0.9, 0.999), eps=1e-8) with weight decay masked off for biases
and norm parameters, and a step-based linear-warmup + cosine LR schedule.

In our parameter tree the no-decay set is exactly {leaf name 'bias', norm
'scale'/'bias'} — the same set the reference selects by name heuristics
(`warmup.py:4-26`: ".bias" / "norm" / "bn" / "ln" / "pos" / "cls_token").
"""

from __future__ import annotations

import jax.numpy as jnp
import optax
from flax import traverse_util


def warmup_cosine_lr(
    base_lr: float,
    total_steps: int,
    warmup_steps: int,
    min_lr: float = 0.0,
):
    """Step-based warmup->cosine schedule (reference `warmup.py:29-59`).

    The schedule value at 0-based optimizer step ``count`` equals the
    reference's LR after ``t = count + 1`` scheduler steps (the reference
    steps the scheduler *after* the optimizer, so its very first update runs
    at the un-scheduled base LR — a quirk we deliberately do not copy; we
    apply the intended warmup from step 0).
    """

    def schedule(count):
        t = count + 1
        if warmup_steps > 0:
            warm = base_lr * t / warmup_steps
        else:
            warm = base_lr
        tt = jnp.minimum(t, total_steps)
        denom = max(1, total_steps - warmup_steps)
        progress = (tt - warmup_steps) / denom
        cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        decayed = min_lr + (base_lr - min_lr) * cosine
        return jnp.where((warmup_steps > 0) & (t <= warmup_steps), warm, decayed)

    return schedule


def no_weight_decay_mask(params) -> dict:
    """True for leaves that should receive weight decay (conv/linear kernels),
    False for biases and norm scales/biases."""
    flat = traverse_util.flatten_dict(params)
    mask = {path: (path[-1] == "kernel") for path in flat}
    return traverse_util.unflatten_dict(mask)


def make_optimizer(
    learning_rate,
    weight_decay: float = 0.05,
    grad_clip_norm: float | None = 1.0,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW with global-norm clipping and masked weight decay.

    ``learning_rate`` may be a float or an optax schedule.
    """
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(
        optax.adamw(
            learning_rate=learning_rate,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=weight_decay,
            mask=no_weight_decay_mask,
        )
    )
    return optax.chain(*chain)


def seed_everything(seed: int, deterministic: bool = False) -> None:
    """Host-side RNG seeding for reproducible data pipelines (the reference's
    `seed_everything`, `src/training/autocast.py:8-17`). Device-side
    randomness in this framework is fully keyed (`jax.random`), so only the
    python/numpy generators used by host code need seeding; ``deterministic``
    is accepted for signature parity (XLA is deterministic by default)."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
