"""Epoch-level training orchestration.

Same surface and semantics as the reference trainer
(`src/training/train_full_model.py:24-307`): AdamW with no-decay groups,
step-based warmup-cosine LR, resume, per-epoch train -> save-last -> val ->
save-best -> early-stop, the same 17-series history dict, and the same
printed log-line formats. TPU differences: bf16 compute replaces the fp16
GradScaler (no scaler; overflow counting degenerates to the non-finite-step
counter), and memory comes from TPU allocator stats instead of CUDA.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from outgridvit_tpu.data.pipeline import Prefetcher
from outgridvit_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_train_state,
    superbatch_sharding,
)
from outgridvit_tpu.training.checkpoints import load_checkpoint, save_checkpoint
from outgridvit_tpu.training.optim import make_optimizer, warmup_cosine_lr
from outgridvit_tpu.training.steps import (
    StepConfig,
    make_eval_step,
    make_eval_superstep,
    make_train_step,
    make_train_superstep,
)
from outgridvit_tpu.training.train_state import TrainState


def _group_batches(it, k: int, full_bs: int):
    """Stack runs of ``k`` full-size host batches into [k, B, ...]
    superbatches; anything irregular (the ragged tail, the <k remainder)
    passes through as single batches."""
    buf = []

    def flush():
        nonlocal buf
        if len(buf) == k:
            yield np.stack([b[0] for b in buf]), np.stack([b[1] for b in buf])
        else:
            yield from buf
        buf = []

    for x, y in it:
        if y.shape[0] != full_bs:
            yield from flush()
            yield x, y
            continue
        buf.append((x, y))
        if len(buf) == k:
            yield from flush()
    yield from flush()


def _super_iter(loader, k: int, data_shard):
    """(iterator, sharding) for K-scanned eval dispatch: full-size batches
    group into [K, B, ...] superbatches (ragged tails pass through), and a
    NamedSharding is wrapped with the ndim-keyed rule so superbatches
    shard the BATCH axis, not the scan axis."""
    import itertools

    it = iter(loader)
    try:
        first = next(it)
    except StopIteration:
        return iter(()), data_shard
    it = _group_batches(itertools.chain([first], it), k, first[1].shape[0])
    if data_shard is not None and not callable(data_shard):
        from jax.sharding import NamedSharding, PartitionSpec

        batch_shard = data_shard
        super_shard = NamedSharding(
            batch_shard.mesh, PartitionSpec(None, *batch_shard.spec))

        def shard_fn(a):  # labels [K,B] / images [K,B,H,W,C]
            return super_shard if a.ndim in (2, 5) else batch_shard

        return it, shard_fn
    return it, data_shard


def _device_mem_gib() -> float:
    try:
        stats = jax.local_devices()[0].memory_stats()
        return float(stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))) / (
            1024**3
        )
    except Exception:
        return float("nan")


def _dtype_from_cfg(autocast_dtype: str, use_amp: bool):
    """Map the reference's autocast knob onto a TPU compute dtype: fp16/bf16
    -> bfloat16 (TPU-native), fp32 or amp-off -> float32."""
    if not use_amp:
        return jnp.float32
    return {
        "fp16": jnp.bfloat16,
        "float16": jnp.bfloat16,
        "bf16": jnp.bfloat16,
        "bfloat16": jnp.bfloat16,
        "fp32": jnp.float32,
        "float32": jnp.float32,
    }.get(str(autocast_dtype).lower(), jnp.bfloat16)


def train_model(
    model,
    train_loader,
    epochs: int = 100,
    val_loader=None,
    device: str = "tpu",  # accepted for CLI compatibility; jax picks devices
    lr: float = 5e-4,
    weight_decay: float = 0.05,
    autocast_dtype: str = "bf16",
    use_amp: bool = True,
    grad_clip_norm: Optional[float] = 1.0,
    warmup_ratio: float = 0.05,
    min_lr: float = 0.0,
    label_smoothing: float = 0.1,
    print_every: int = 100,
    save_path: str = "best_model.ckpt",
    last_path: str = "last_model.ckpt",
    resume_path: Optional[str] = None,
    mixup_alpha: float = 0.0,
    cutmix_alpha: float = 0.0,
    mix_prob: float = 1.0,
    num_classes: int = 100,
    channels_last: bool = False,  # NHWC-native: accepted and ignored
    early_stop: bool = True,
    early_stop_metric: str = "top1",
    early_stop_patience: int = 6,
    early_stop_min_delta: float = 0.05,
    early_stop_require_monotonic: bool = False,
    seed: int = 7,
    mesh=None,
    state: Optional[TrainState] = None,
    steps_per_dispatch: int = 1,
):
    """Train; returns ``(history, state)`` (the reference returns
    ``(history, model)``; the TrainState is the functional equivalent)."""
    if mesh is None:
        mesh = make_mesh()
    data_shard = batch_sharding(mesh)

    # Multi-process mode (SURVEY §5): every process runs this same loop
    # over the same global mesh; only process 0 logs (checkpoint writes are
    # gated inside save_checkpoint, whose host-gather is collective; the
    # Prefetcher assembles global batches from per-process loader rows).
    n_proc = jax.process_count()
    log = print if jax.process_index() == 0 else (lambda *a, **k: None)

    steps_per_epoch = len(train_loader)
    total_steps = epochs * steps_per_epoch
    warmup_steps = int(total_steps * warmup_ratio)
    schedule = warmup_cosine_lr(lr, total_steps, warmup_steps, min_lr)
    tx = make_optimizer(schedule, weight_decay, grad_clip_norm)

    compute_dtype = _dtype_from_cfg(autocast_dtype, use_amp)
    if getattr(model, "dtype", None) != compute_dtype:
        model = model.clone(dtype=compute_dtype)

    # ---- init state from the first batch's shapes. The peeked batch is
    # re-queued as the first training batch when the loader hands out a
    # one-shot iterator (iter(loader) returning the same object), so no
    # batch is silently dropped; a re-iterable loader (ArrayDataLoader)
    # simply gets a fresh iterator per epoch and the peek costs nothing.
    import itertools

    _peek_iter = iter(train_loader)
    first = next(_peek_iter)
    _requeue = (
        [(first, _peek_iter)] if iter(train_loader) is _peek_iter else []
    )
    x0, y0 = first
    bs0 = x0.shape[0]
    img_shape = (bs0, x0.shape[3], x0.shape[1], x0.shape[2])  # print as NCHW

    if state is None:
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(seed), jnp.zeros(x0.shape, jnp.float32)
        )
        state = TrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=tx,
        )
    state = shard_train_state(state, mesh)

    # loaders built with device_augment=True yield raw uint8 and carry the
    # AugmentConfig; the whole recipe then runs inside the jitted step
    aug_cfg = getattr(train_loader, "device_augment", None)
    step_cfg = StepConfig(
        num_classes=num_classes,
        label_smoothing=label_smoothing,
        mixup_alpha=mixup_alpha,
        cutmix_alpha=cutmix_alpha,
        mix_prob=mix_prob,
        grad_clip_norm=grad_clip_norm,
        augment=aug_cfg,
    )
    train_step = make_train_step(step_cfg, lr_schedule=schedule)
    # K>1: scan K steps per dispatch (amortizes the per-dispatch host round
    # trip, which dominates over remote-device links once a step is ~20 ms)
    kdisp = max(1, int(steps_per_dispatch))
    train_superstep = (
        make_train_superstep(step_cfg, lr_schedule=schedule) if kdisp > 1
        else None
    )
    super_shard = superbatch_sharding(mesh)
    eval_norm = getattr(val_loader, "device_normalize", None)
    eval_step = make_eval_step(
        model.apply, label_smoothing=0.0, normalize=eval_norm)
    # the val epoch pays the same per-batch dispatch round trip the train
    # path amortizes; scan the same K when superdispatching
    eval_superstep = (make_eval_superstep(
        model.apply, label_smoothing=0.0, normalize=eval_norm)
        if kdisp > 1 else None)
    base_rng = jax.random.PRNGKey(seed)

    # ---- resume / best tracking (reference `train_full_model.py:73-103`)
    start_epoch = 0
    best_val_top1 = -float("inf")
    best_val_loss = float("inf")
    best_epoch = 0
    metric = early_stop_metric.lower()
    assert metric in ("top1", "loss")
    mode = "max" if metric == "top1" else "min"
    best_metric = -float("inf") if mode == "max" else float("inf")

    if resume_path is not None:
        ckpt = load_checkpoint(resume_path, state)
        state = ckpt["state"]
        state = shard_train_state(state, mesh)
        start_epoch = int(ckpt.get("epoch", 0))
        best_val_top1 = float(ckpt.get("best_top1", best_val_top1))
        extra = ckpt.get("extra", {}) or {}
        best_val_loss = float(extra.get("best_val_loss", best_val_loss))
        best_epoch = int(extra.get("best_epoch", best_epoch))
        best_metric = float(extra.get("best_metric", best_metric))
        log(
            f"Resumed from {resume_path} at epoch {start_epoch} | "
            f"best_top1 {best_val_top1:.2f}% | best_loss {best_val_loss:.4f} | "
            f"best_{metric} {best_metric:.6f}"
        )

    history = {
        "train_loss": [], "train_top1": [], "train_top3": [], "train_top5": [],
        "val_loss": [], "val_top1": [], "val_top3": [], "val_top5": [],
        "lr": [],
        "train_grad_norm": [], "train_clip_frac": [], "train_amp_overflows": [],
        "train_nonfinite_loss_steps": [], "train_scaler_scale": [],
        "train_mem_alloc_gib": [], "train_mem_res_gib": [],
        "val_mem_alloc_gib": [], "val_mem_res_gib": [],
    }

    patience = int(early_stop_patience)
    bad_epochs = 0
    last_vals = []

    def _is_improvement(curr, best):
        d = float(early_stop_min_delta)
        return (curr > best + d) if mode == "max" else (curr < best - d)

    def _degradation_monotonic(vals):
        if not early_stop_require_monotonic or len(vals) < 2:
            return True
        if mode == "max":
            return all(vals[i] >= vals[i + 1] for i in range(len(vals) - 1))
        return all(vals[i] <= vals[i + 1] for i in range(len(vals) - 1))

    # ---- run-config banner (reference `train_full_model.py:136-146`)
    log("=== Run config ===")
    log(
        f"device={jax.default_backend()}x{len(jax.devices())} | amp={use_amp} | "
        f"autocast_dtype={autocast_dtype} (compute={compute_dtype.__name__}) | "
        f"mesh={dict(mesh.shape)}"
    )
    log(
        f"epochs={epochs} | steps/epoch={steps_per_epoch} | "
        f"total_steps={total_steps} | warmup_steps={warmup_steps}"
    )
    log(f"batch_size={bs0 * n_proc}"
        + (f" ({n_proc} procs x {bs0} local)" if n_proc > 1 else "")
        + f" | input_shape={img_shape} | num_classes={num_classes}")
    log(f"opt=AdamW | lr={lr} | wd={weight_decay} | grad_clip_norm={grad_clip_norm}")
    log(
        f"aug: mix_prob={mix_prob} | mixup_alpha={mixup_alpha} | "
        f"cutmix_alpha={cutmix_alpha} | label_smoothing={label_smoothing}"
        + (" | device_augment=on" if aug_cfg is not None else "")
    )
    if val_loader is not None:
        log(
            f"early_stop={early_stop} | metric={metric} | patience={patience} | "
            f"min_delta={early_stop_min_delta}"
        )
    else:
        log("val_loader=None => no early-stop / no best saving by val metric.")
    log("==================")

    # optional profiler trace of the first trained epoch (reference only has
    # print-based tracing, SURVEY §5; set OUTGRIDVIT_PROFILE_DIR to capture)
    import os

    profile_dir = os.environ.get("OUTGRIDVIT_PROFILE_DIR")

    for epoch in range(start_epoch + 1, epochs + 1):
        log(f"\n=== Epoch {epoch}/{epochs} ===")
        t_epoch = time.time()
        if hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(epoch)
        if profile_dir and epoch == start_epoch + 1:
            jax.profiler.start_trace(profile_dir)

        # ---------------- train epoch
        t0 = time.time()
        device_metrics = []  # not-yet-fetched device-side step metrics
        host_metrics = []  # fetched plain-float dicts
        total = 0
        nsteps = len(train_loader)

        def drain():
            # ONE bulk device->host transfer; per-scalar float() costs a
            # round trip each, which is ruinous over remote-device links.
            # Concatenate per key on device first: the fetch then moves one
            # buffer per metric instead of steps x metrics tiny scalars
            # (superstep entries are already [K]-vectors; flatten uniformly).
            nonlocal device_metrics
            if device_metrics:
                ks = list(device_metrics[0].keys())
                if n_proc > 1:
                    # eager jnp ops on cross-process (non-addressable)
                    # arrays are not allowed; the metrics are replicated,
                    # so a bulk device_get of the pytree works everywhere
                    # (superstep entries are [K]-vectors: flatten them)
                    for d in jax.device_get(device_metrics):
                        cols = {k: np.atleast_1d(d[k]) for k in ks}
                        host_metrics.extend(
                            {k: float(cols[k][i]) for k in ks}
                            for i in range(len(cols[ks[0]]))
                        )
                    device_metrics = []
                    return
                stacked = {
                    k: jnp.concatenate(
                        [jnp.atleast_1d(d[k]) for d in device_metrics])
                    for k in ks
                }
                fetched = jax.device_get(stacked)
                n = len(fetched[ks[0]])
                host_metrics.extend(
                    {k: float(fetched[k][i]) for k in ks} for i in range(n)
                )
                device_metrics = []

        if _requeue:  # one-shot iterator: replay the shape-peeked batch
            fb, it0 = _requeue.pop()
            epoch_iter = itertools.chain([fb], it0)
        else:
            epoch_iter = iter(train_loader)
        if kdisp > 1:
            host_iter = _group_batches(epoch_iter, kdisp, bs0)

            def shard_fn(a):  # labels [K,B] / images [K,B,H,W,C]
                return super_shard if a.ndim in (2, 5) else data_shard
        else:
            host_iter = epoch_iter
            shard_fn = data_shard

        step = 0
        last_print_bucket = 0
        for batch in Prefetcher(host_iter, sharding=shard_fn):
            xb, yb = batch
            if yb.ndim == 2:  # [K, B] superbatch
                state, m = train_superstep(state, (xb, yb), base_rng)
                step += yb.shape[0]
                total += yb.shape[0] * yb.shape[1]
            else:
                state, m = train_step(state, (xb, yb), base_rng)
                step += 1
                total += yb.shape[0]
            device_metrics.append(m)
            bucket = step // print_every if print_every else 0
            if print_every and (bucket > last_print_bucket or step == nsteps):
                last_print_bucket = bucket
                drain()
                # skipped (non-finite) steps are excluded from the means,
                # matching the reference's running averages
                # (`one_epoch_train.py:99-108,156`)
                finite_ms = [s for s in host_metrics
                             if s["nonfinite"] == 0.0] or host_metrics
                mm = {
                    k: float(np.mean([s[k] for s in finite_ms]))
                    for k in ("loss", "top1", "top3", "top5", "grad_norm")
                }
                oflow = int(sum(s["nonfinite"] for s in host_metrics))
                clip_pct = 100.0 * float(
                    np.mean([s["clipped"] for s in host_metrics])
                )
                lr_now = host_metrics[-1]["lr"]
                dt = time.time() - t0
                log(
                    f"[train step {step}/{nsteps}] "
                    f"loss {mm['loss']:.4f} | "
                    f"top1 {mm['top1']:.2f}% | top3 {mm['top3']:.2f}% | "
                    f"top5 {mm['top5']:.2f}% | "
                    f"{total / max(dt, 1e-9):.1f} img/s | lr {lr_now:.2e} | "
                    f"gnorm {mm['grad_norm']:.3f} | clip {clip_pct:.1f}% | "
                    f"oflow 0 | nonfinite {oflow} | scale 1.0"
                )

        if profile_dir and epoch == start_epoch + 1:
            jax.profiler.stop_trace()
            log(f"[profile] wrote jax trace to {profile_dir}")

        drain()
        finite_ms = [s for s in host_metrics
                     if s["nonfinite"] == 0.0] or host_metrics
        tr = {
            k: float(np.mean([s[k] for s in finite_ms]))
            for k in ("loss", "top1", "top3", "top5", "grad_norm", "clipped")
        }
        nonfinite_steps = int(sum(s["nonfinite"] for s in host_metrics))
        lr_now = host_metrics[-1]["lr"]
        mem_gib = _device_mem_gib()

        history["train_loss"].append(tr["loss"])
        history["train_top1"].append(tr["top1"])
        history["train_top3"].append(tr["top3"])
        history["train_top5"].append(tr["top5"])
        history["lr"].append(lr_now)
        history["train_grad_norm"].append(tr["grad_norm"])
        history["train_clip_frac"].append(tr["clipped"])
        history["train_amp_overflows"].append(0.0)
        history["train_nonfinite_loss_steps"].append(float(nonfinite_steps))
        history["train_scaler_scale"].append(1.0)
        history["train_mem_alloc_gib"].append(mem_gib)
        history["train_mem_res_gib"].append(mem_gib)

        log(
            f"[Train] loss {tr['loss']:.4f} | top1 {tr['top1']:.2f}% | "
            f"top3 {tr['top3']:.2f}% | top5 {tr['top5']:.2f}% | "
            f"lr {lr_now:.2e} | "
            f"grad_norm {tr['grad_norm']:.3f} | clip {100 * tr['clipped']:.1f}% | "
            f"amp_overflows 0 | nonfinite_loss {nonfinite_steps} | scale 1.0"
        )
        if np.isfinite(mem_gib):
            log(f"[Train] mem_peak alloc {mem_gib:.2f} GiB | reserved {mem_gib:.2f} GiB")

        # save "last" every epoch (reference `train_full_model.py:212-225`)
        save_checkpoint(
            last_path, state, epoch=epoch, best_top1=best_val_top1,
            extra={
                "autocast_dtype": autocast_dtype,
                "use_amp": use_amp,
                "best_val_loss": best_val_loss,
                "best_epoch": best_epoch,
                "best_metric": best_metric,
                "early_stop_metric": metric,
                "early_stop_patience": patience,
                "early_stop_min_delta": float(early_stop_min_delta),
            },
        )

        stop_now = False

        # ---------------- validation
        if val_loader is not None:
            if hasattr(val_loader, "set_epoch"):
                val_loader.set_epoch(epoch)
            va = _run_eval(eval_step, state, val_loader, data_shard,
                           eval_superstep=eval_superstep, k=kdisp)
            val_mem = _device_mem_gib()
            history["val_loss"].append(va["loss"])
            history["val_top1"].append(va["top1"])
            history["val_top3"].append(va["top3"])
            history["val_top5"].append(va["top5"])
            history["val_mem_alloc_gib"].append(val_mem)
            history["val_mem_res_gib"].append(val_mem)

            log(
                f"[Val]   loss {va['loss']:.4f} | top1 {va['top1']:.2f}% | "
                f"top3 {va['top3']:.2f}% | top5 {va['top5']:.2f}%"
            )
            if np.isfinite(val_mem):
                log(f"[Val]   mem_peak alloc {val_mem:.2f} GiB | reserved {val_mem:.2f} GiB")

            if va["top1"] > best_val_top1:
                best_val_top1 = va["top1"]
            if va["loss"] < best_val_loss:
                best_val_loss = va["loss"]
            curr_metric = va["top1"] if metric == "top1" else va["loss"]

            if _is_improvement(curr_metric, best_metric):
                best_metric = curr_metric
                best_epoch = int(epoch)
                save_checkpoint(
                    save_path, state, epoch=epoch, best_top1=best_val_top1,
                    extra={
                        "autocast_dtype": autocast_dtype,
                        "use_amp": use_amp,
                        "best_val_loss": best_val_loss,
                        "best_epoch": best_epoch,
                        "best_metric": best_metric,
                        "best_metric_name": metric,
                    },
                )
                log(f"Best saved to {save_path} (val {metric} = {best_metric:.6f})")
                bad_epochs = 0
            else:
                bad_epochs += 1

            if early_stop:
                last_vals.append(curr_metric)
                if len(last_vals) > patience:
                    last_vals = last_vals[-patience:]
                if bad_epochs >= patience and _degradation_monotonic(last_vals):
                    log(
                        f"Early-stop: no improvement on val_{metric} for "
                        f"{patience} epochs."
                    )
                    stop_now = True

        if stop_now:
            break
        dt = time.time() - t_epoch
        log(f"Epoch time: {dt / 60:.2f} min")

    return history, state


def _run_eval(eval_step, state, loader, data_shard=None,
              eval_superstep=None, k: int = 1):
    """Weighted-average eval over a loader (reference
    `one_epoch_train.py:209-259`).

    Metrics stay device-side during the epoch; one bulk ``jax.device_get``
    fetches them all (per-batch ``float()`` costs a host round trip each,
    ruinous over remote-device links — same fix as the train loop's drain).
    With ``eval_superstep``/``k`` (from ``make_eval_superstep``), runs of
    ``k`` batches are evaluated by ONE dispatched program — the eval twin
    of the train path's K-step scan (ragged tails fall back)."""
    if eval_superstep is not None and k > 1:
        host_iter, data_shard = _super_iter(loader, k, data_shard)
    else:
        host_iter = iter(loader)
    device_metrics = []
    sizes = []  # one weight array per dispatch
    for batch in Prefetcher(host_iter, sharding=data_shard):
        labels = batch[1]
        if labels.ndim == 2:  # [K, B] superbatch
            device_metrics.append(
                eval_superstep(state.params, state.batch_stats, batch))
            sizes.append(np.full(labels.shape[0], labels.shape[1],
                                 dtype=np.float64))
        else:
            device_metrics.append(
                eval_step(state.params, state.batch_stats, batch))
            sizes.append(np.array([labels.shape[0]], dtype=np.float64))
    if not device_metrics:
        return {"loss": 0.0, "top1": 0.0, "top3": 0.0, "top5": 0.0}
    fetched = jax.device_get(device_metrics)
    n = float(sum(float(b.sum()) for b in sizes))
    return {
        key: float(sum((np.asarray(d[key], dtype=np.float64) * b).sum()
                       for d, b in zip(fetched, sizes))) / max(1.0, n)
        for key in ("loss", "top1", "top3", "top5")
    }
