"""Jitted train / eval steps.

The whole per-step body — mixup/cutmix, forward, loss, backward, clipping,
non-finite guard, optimizer update, metrics — is ONE XLA program (the
reference splits this across ~10 host-side stages per step,
`src/training/one_epoch_train.py:65-186`). The train state is donated, so
parameters update in place in HBM.

Non-finite guard: the reference skips the optimizer step when the loss is
non-finite (`one_epoch_train.py:99-108`); we do the same with a select on the
whole state (params/opt_state/batch_stats keep their old values), traced.

Sharding: pass a ``jax.sharding.Mesh`` + batch/state shardings via
``outgridvit_tpu.parallel`` and wrap with ``jax.jit(in_shardings=...)`` — the
step function itself is sharding-agnostic (GSPMD handles the gradient
all-reduce and cross-device BN statistics automatically).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from outgridvit_tpu.training.losses import (
    cross_entropy_smoothed,
    soft_target_cross_entropy,
)
from outgridvit_tpu.training.metrics import accuracy_topk
from outgridvit_tpu.training.mixing import apply_mixup_cutmix


@dataclasses.dataclass(frozen=True)
class StepConfig:
    num_classes: int
    label_smoothing: float = 0.1
    mixup_alpha: float = 0.0
    cutmix_alpha: float = 0.0
    mix_prob: float = 1.0
    grad_clip_norm: Optional[float] = 1.0
    # when set, batches are RAW uint8 images and the whole augmentation
    # recipe (crop/flip/RandAugment/normalize/erasing) runs in-jit on device
    # (ops/augment.py) — the TPU-first answer to the reference's DataLoader
    # worker pool (`load_cifrar100.py:121-137`)
    augment: Optional["AugmentConfig"] = None  # noqa: F821


def make_train_step(cfg: StepConfig, lr_schedule=None, jit: bool = True,
                    **jit_kwargs):
    """Build the train step: (state, batch=(images NHWC, int labels),
    base_rng) -> (new_state, metrics dict)."""

    mixing = cfg.mixup_alpha > 0.0 or cfg.cutmix_alpha > 0.0

    def train_step(state, batch, base_rng):
        images, labels = batch
        rng = jax.random.fold_in(base_rng, state.step)
        r_aug, r_mix, r_drop, r_dpath = jax.random.split(rng, 4)
        if cfg.augment is not None:
            from outgridvit_tpu.ops.augment import augment_train_batch

            images = augment_train_batch(r_aug, images, cfg.augment)

        images_aug, targets_soft = apply_mixup_cutmix(
            r_mix, images, labels,
            num_classes=cfg.num_classes,
            mixup_alpha=cfg.mixup_alpha,
            cutmix_alpha=cfg.cutmix_alpha,
            prob=cfg.mix_prob,
        )

        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images_aug,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": r_drop, "droppath": r_dpath},
            )
            if mixing:
                loss = soft_target_cross_entropy(logits, targets_soft)
            else:
                loss = cross_entropy_smoothed(logits, labels,
                                              cfg.label_smoothing)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        gnorm = optax.global_norm(grads)
        updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)

        finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)

        def select(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new, old
            )

        # (a masked-update variant for params — p + u*finite — benched
        # identical to the select at 8.55k imgs/s; keeping the simpler
        # uniform select)
        new_state = state.replace(
            step=state.step + 1,
            params=select(new_params, state.params),
            opt_state=select(new_opt_state, state.opt_state),
            batch_stats=select(new_batch_stats, state.batch_stats),
        )

        accs = accuracy_topk(logits, targets_soft if mixing else labels)
        metrics = {
            "loss": jnp.where(finite, loss, 0.0),
            "top1": accs[1],
            "top3": accs[3],
            "top5": accs[5],
            "grad_norm": jnp.where(finite, gnorm, 0.0),
            "clipped": (
                (gnorm > cfg.grad_clip_norm).astype(jnp.float32)
                if cfg.grad_clip_norm is not None
                else jnp.float32(0.0)
            ),
            "nonfinite": (~finite).astype(jnp.float32),
        }
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return new_state, metrics

    if jit:
        return jax.jit(train_step, donate_argnums=(0,), **jit_kwargs)
    return train_step


def make_train_superstep(cfg: StepConfig, lr_schedule=None, jit: bool = True,
                         **jit_kwargs):
    """K train steps in ONE dispatched XLA program via ``lax.scan``.

    (state, (images [K,B,...], labels [K,B]), base_rng) ->
    (new_state, metrics dict of [K] arrays).

    Over remote-device links the per-dispatch host round trip dominates once
    the step itself is ~20 ms; scanning K steps amortizes it K-fold. Inside
    the scan each step is the exact single-step body (same rng fold on
    state.step, same non-finite guard), so results are bit-identical to K
    sequential dispatches."""
    inner = make_train_step(cfg, lr_schedule, jit=False)

    def superstep(state, batches, base_rng):
        def body(st, xy):
            st, m = inner(st, xy, base_rng)
            return st, m

        return jax.lax.scan(body, state, batches)

    if jit:
        return jax.jit(superstep, donate_argnums=(0,), **jit_kwargs)
    return superstep


def make_eval_step(apply_fn, label_smoothing: float = 0.0, jit: bool = True,
                   normalize=None, **jit_kwargs):
    """Eval step: (variables-like (params, batch_stats), batch) -> metrics.
    Matches reference `evaluate_one_epoch` (`one_epoch_train.py:209-259`):
    CE loss (default no smoothing) + top1/3/5.

    ``normalize=(mean, std)``: batches arrive as raw uint8 and are
    normalized in-jit (the eval twin of the train path's device
    augmentation — 4x less host->device traffic)."""

    def eval_step(params, batch_stats, batch):
        images, labels = batch
        if normalize is not None:
            from outgridvit_tpu.ops.augment import normalize_batch

            images = normalize_batch(images, *normalize)
        logits = apply_fn(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )
        loss = cross_entropy_smoothed(logits, labels, label_smoothing)
        accs = accuracy_topk(logits, labels)
        return {
            "loss": loss,
            "top1": accs[1],
            "top3": accs[3],
            "top5": accs[5],
        }

    if jit:
        return jax.jit(eval_step, **jit_kwargs)
    return eval_step


def make_eval_superstep(apply_fn, label_smoothing: float = 0.0,
                        jit: bool = True, normalize=None, **jit_kwargs):
    """K eval batches in ONE dispatched XLA program via ``lax.scan`` — the
    eval twin of :func:`make_train_superstep`.

    (params, batch_stats, (images [K,B,...], labels [K,B])) ->
    metrics dict of [K] arrays, bit-identical to K sequential
    :func:`make_eval_step` calls.

    The eval epoch is dominated by per-batch host->device transfers and
    dispatches on remote-device links (docs/PERFORMANCE.md); stacking K
    batches turns K puts + K dispatches into one of each."""
    inner = make_eval_step(apply_fn, label_smoothing, jit=False,
                           normalize=normalize)

    def eval_superstep(params, batch_stats, superbatch):
        def body(carry, batch):
            return carry, inner(params, batch_stats, batch)

        _, ms = jax.lax.scan(body, 0, superbatch)
        return ms

    if jit:
        return jax.jit(eval_superstep, **jit_kwargs)
    return eval_superstep
