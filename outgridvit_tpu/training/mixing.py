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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
    y1 = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    if prob <= 0.0 or (mixup_alpha <= 0.0 and cutmix_alpha <= 0.0):
        return images, y1

    B, H, W, _ = images.shape
    r_apply, r_choice, r_perm, r_lam_m, r_lam_c, r_cx, r_cy = jax.random.split(rng, 7)

    perm = jax.random.permutation(r_perm, B)
    x2img = images[perm]
    y2 = y1[perm]

    # --- mixup branch ---
    if mixup_alpha > 0.0:
        lam_m = jax.random.beta(r_lam_m, mixup_alpha, mixup_alpha)
    else:
        lam_m = jnp.float32(1.0)
    x_mix = images * lam_m.astype(images.dtype) + x2img * (1.0 - lam_m).astype(
        images.dtype
    )

    # --- cutmix branch ---
    if cutmix_alpha > 0.0:
        lam_c0 = jax.random.beta(r_lam_c, cutmix_alpha, cutmix_alpha)
    else:
        lam_c0 = jnp.float32(1.0)
    cut_w = (W * jnp.sqrt(1.0 - lam_c0)).astype(jnp.int32)
    cut_h = (H * jnp.sqrt(1.0 - lam_c0)).astype(jnp.int32)
    cx = jax.random.randint(r_cx, (), 0, W)
    cy = jax.random.randint(r_cy, (), 0, H)
    x1b = jnp.maximum(cx - cut_w // 2, 0)
    x2b = jnp.minimum(cx + cut_w // 2, W)
    y1b = jnp.maximum(cy - cut_h // 2, 0)
    y2b = jnp.minimum(cy + cut_h // 2, H)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    box = (col >= x1b) & (col < x2b) & (row >= y1b) & (row < y2b)  # [H, W]
    x_cut = jnp.where(box[None, :, :, None], x2img, images)
    area = (x2b - x1b) * (y2b - y1b)
    lam_c = 1.0 - area.astype(jnp.float32) / float(W * H)

    # --- choose branch ---
    if cutmix_alpha > 0.0 and mixup_alpha > 0.0:
        use_cutmix = jax.random.bernoulli(r_choice, 0.5)
    elif cutmix_alpha > 0.0:
        use_cutmix = jnp.bool_(True)
    else:
        use_cutmix = jnp.bool_(False)

    x_aug = jnp.where(use_cutmix, x_cut, x_mix)
    lam = jnp.where(use_cutmix, lam_c, lam_m)

    # --- apply with probability `prob` ---
    apply = jax.random.bernoulli(r_apply, prob) if prob < 1.0 else jnp.bool_(True)
    images_out = jnp.where(apply, x_aug, images)
    targets_soft = jnp.where(apply, lam * y1 + (1.0 - lam) * y2, y1)
    return images_out, targets_soft
