"""Mixup / CutMix as a pure, jittable function.

Same sampling semantics as the reference (`src/training/cutmix_mixup_aug.py`):
- with probability ``prob`` apply mixing, else return one-hot targets;
- if both alphas > 0, choose cutmix vs mixup 50/50;
- mixup: convex blend with lam ~ Beta(a, a);
- cutmix: a box of side ``W*sqrt(1-lam)`` centered at a uniform pixel, clipped
  to the image; lam is corrected by the actually-swapped area.

The reference runs this on the host with python ``random`` before every step;
here it is traced into the train step (NHWC, keyed by ``jax.random``), so the
whole step remains one XLA program with no host round-trips. The cutmix box
uses an iota mask instead of dynamic slicing (traced box sizes cannot be
sliced statically under jit).

Split into ``sample_mix_draws`` (all randomness) + ``apply_mix_draws`` (pure
deterministic math) so cross-framework tests can extract the exact draws the
production step will use and replay them through a PyTorch trainer
(tests/test_torch_parity.py::test_training_trajectory_parity_with_mixing).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MixDraws(NamedTuple):
    """Every random draw one mixing application consumes (all jnp scalars /
    arrays, so they can be fetched to host and replayed elsewhere)."""

    perm: jnp.ndarray      # [B] int — partner permutation
    lam_m: jnp.ndarray     # scalar f32 — mixup blend factor
    lam_c0: jnp.ndarray    # scalar f32 — cutmix Beta draw (pre-correction)
    cx: jnp.ndarray        # scalar i32 — cutmix box center x
    cy: jnp.ndarray        # scalar i32 — cutmix box center y
    use_cutmix: jnp.ndarray  # scalar bool
    apply: jnp.ndarray     # scalar bool — mix at all this step


def sample_mix_draws(
    rng: jax.Array,
    batch: int,
    height: int,
    width: int,
    mixup_alpha: float = 0.0,
    cutmix_alpha: float = 0.0,
    prob: float = 1.0,
) -> MixDraws:
    """Sample the draws ``apply_mixup_cutmix`` consumes. The split order is
    part of the function's contract (fixed since round 2): reproducing a
    production step's mixing only needs its ``r_mix`` key and the batch
    geometry."""
    r_apply, r_choice, r_perm, r_lam_m, r_lam_c, r_cx, r_cy = jax.random.split(
        rng, 7)
    perm = jax.random.permutation(r_perm, batch)
    if mixup_alpha > 0.0:
        lam_m = jax.random.beta(r_lam_m, mixup_alpha, mixup_alpha)
    else:
        lam_m = jnp.float32(1.0)
    if cutmix_alpha > 0.0:
        lam_c0 = jax.random.beta(r_lam_c, cutmix_alpha, cutmix_alpha)
    else:
        lam_c0 = jnp.float32(1.0)
    cx = jax.random.randint(r_cx, (), 0, width)
    cy = jax.random.randint(r_cy, (), 0, height)
    if cutmix_alpha > 0.0 and mixup_alpha > 0.0:
        use_cutmix = jax.random.bernoulli(r_choice, 0.5)
    elif cutmix_alpha > 0.0:
        use_cutmix = jnp.bool_(True)
    else:
        use_cutmix = jnp.bool_(False)
    apply = (jax.random.bernoulli(r_apply, prob) if prob < 1.0
             else jnp.bool_(True))
    return MixDraws(perm, lam_m, lam_c0, cx, cy, use_cutmix, apply)


def cutmix_box(lam_c0, cx, cy, height: int, width: int):
    """Clipped cutmix box (x1, x2, y1, y2) and area-corrected lambda
    (reference `cutmix_mixup_aug.py:42-59`)."""
    cut_w = (width * jnp.sqrt(1.0 - lam_c0)).astype(jnp.int32)
    cut_h = (height * jnp.sqrt(1.0 - lam_c0)).astype(jnp.int32)
    x1b = jnp.maximum(cx - cut_w // 2, 0)
    x2b = jnp.minimum(cx + cut_w // 2, width)
    y1b = jnp.maximum(cy - cut_h // 2, 0)
    y2b = jnp.minimum(cy + cut_h // 2, height)
    area = (x2b - x1b) * (y2b - y1b)
    lam_c = 1.0 - area.astype(jnp.float32) / float(width * height)
    return (x1b, x2b, y1b, y2b), lam_c


def apply_mix_draws(
    images: jnp.ndarray,   # [B, H, W, C]
    targets: jnp.ndarray,  # [B] int
    draws: MixDraws,
    num_classes: int,
):
    """Deterministic mixing given concrete draws: (images, soft targets)."""
    B, H, W, _ = images.shape
    y1 = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    x2img = images[draws.perm]
    y2 = y1[draws.perm]

    lam_m = draws.lam_m
    x_mix = images * lam_m.astype(images.dtype) + x2img * (
        1.0 - lam_m).astype(images.dtype)

    (x1b, x2b, y1b, y2b), lam_c = cutmix_box(draws.lam_c0, draws.cx,
                                             draws.cy, H, W)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    box = (col >= x1b) & (col < x2b) & (row >= y1b) & (row < y2b)  # [H, W]
    x_cut = jnp.where(box[None, :, :, None], x2img, images)

    x_aug = jnp.where(draws.use_cutmix, x_cut, x_mix)
    lam = jnp.where(draws.use_cutmix, lam_c, lam_m)

    images_out = jnp.where(draws.apply, x_aug, images)
    targets_soft = jnp.where(draws.apply, lam * y1 + (1.0 - lam) * y2, y1)
    return images_out, targets_soft


def apply_mixup_cutmix(
    rng: jax.Array,
    images: jnp.ndarray,  # [B, H, W, C]
    targets: jnp.ndarray,  # [B] int
    num_classes: int,
    mixup_alpha: float = 0.0,
    cutmix_alpha: float = 0.0,
    prob: float = 1.0,
):
    """Returns (images_aug [B,H,W,C], targets_soft [B,K])."""
    if prob <= 0.0 or (mixup_alpha <= 0.0 and cutmix_alpha <= 0.0):
        return images, jax.nn.one_hot(targets, num_classes,
                                      dtype=jnp.float32)
    B, H, W, _ = images.shape
    draws = sample_mix_draws(rng, B, H, W, mixup_alpha, cutmix_alpha, prob)
    return apply_mix_draws(images, targets, draws, num_classes)
