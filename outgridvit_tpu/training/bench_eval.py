"""Benchmark evaluation: the analog of the reference's
`evaluate_one_epoch_logs` (`src/training/eval_one_epoch_logs.py:57-217`) —
the function behind every published throughput number.

Reports the same metric dict: loss/top1/top3/top5, imgs_per_sec (whole-epoch
wall clock), ms_per_batch (warmup-excluded, device-synced), parameter
count/size, FLOPs (XLA cost analysis instead of fvcore/thop), and device
memory stats instead of CUDA allocator stats.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np


def count_params(params) -> int:
    return int(sum(p.size for p in jax.tree_util.tree_leaves(params)))


def param_bytes(params) -> int:
    return int(
        sum(p.size * p.dtype.itemsize for p in jax.tree_util.tree_leaves(params))
    )


def flops_of(fn, *args) -> Optional[float]:
    """Forward FLOPs from XLA's cost analysis (replaces fvcore/thop,
    reference `eval_one_epoch_logs.py:34-55`). Returns None if unavailable."""
    try:
        lowered = jax.jit(fn).lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


def format_ops(n: Optional[float]) -> str:
    if n is None or not np.isfinite(n):
        return "n/a"
    for unit in ("", "K", "M", "G", "T"):
        if abs(n) < 1000.0:
            return f"{n:.2f} {unit}FLOPs"
        n /= 1000.0
    return f"{n:.2f} PFLOPs"


def evaluate_one_epoch_logs(
    eval_step,
    state,
    loader,
    data_shard=None,
    warmup_batches: int = 2,
    model_fn=None,
    example_batch=None,
    verbose: bool = True,
    eval_superstep=None,
    k: int = 1,
):
    """Timed eval epoch. ``eval_step`` as from ``make_eval_step``.

    ``eval_superstep``/``k``: when provided (from ``make_eval_superstep``),
    runs of ``k`` full-size batches are stacked host-side and evaluated by
    ONE dispatched program — one transfer + one dispatch per ``k`` batches
    (the eval twin of the train path's K-step scan; ragged tails fall back
    to ``eval_step``)."""
    from outgridvit_tpu.data.pipeline import Prefetcher

    n_params = count_params(state.params)
    size_mb = param_bytes(state.params) / (1024**2)

    flops = None
    if model_fn is not None and example_batch is not None:
        flops = flops_of(model_fn, example_batch)

    # Pipelined epoch: batches are dispatched back-to-back with NO per-batch
    # host sync (a per-batch float() costs a full device round trip — on a
    # tunneled device that is ~70 ms/batch and dominates the measurement;
    # the reference's CUDA-event timing has no such cost,
    # `eval_one_epoch_logs.py:120-160`). The timer starts after the first
    # ``warmup_batches`` dispatches complete (compile excluded) and stops on
    # a final block, so the timed window is device-honest.
    import os

    depth = int(os.environ.get("OUTGRIDVIT_EVAL_DEPTH", 16))
    tw = int(os.environ.get("OUTGRIDVIT_EVAL_TW", 8))
    sync_every = int(os.environ.get("OUTGRIDVIT_EVAL_SYNC", -1))

    if eval_superstep is not None and k > 1:
        # group K batches per dispatch; superbatches shard the BATCH axis
        from outgridvit_tpu.training.loop import _super_iter

        host_iter, data_shard = _super_iter(loader, k, data_shard)
    else:
        host_iter = iter(loader)

    def _last_loss(m):
        return float(np.asarray(jax.device_get(m["loss"])).ravel()[-1])

    device_metrics = []
    sizes = []  # one [n_batches_in_dispatch] array per dispatch
    t_epoch0 = time.perf_counter()
    t_warm = t_epoch0
    timed_dispatches = 0
    timed_images = 0
    timed_batches = 0
    for bi, batch in enumerate(Prefetcher(host_iter, sharding=data_shard,
                                          depth=depth, transfer_workers=tw)):
        if bi == 0 and sync_every < 0:
            # bound in-flight device input buffers ONLY for the fat
            # float32-wire batches of non-device-augment configs; the
            # uint8-wire path is 4x lighter AND a periodic blocking fetch
            # drains the dispatch runway on a tunneled device (measured
            # 12.5k -> 6.6k imgs/s with a sync every 32 batches)
            wire = np.dtype(getattr(batch[0], "dtype", np.float32))
            sync_every = 64 if wire.itemsize >= 4 else 0
        labels = batch[1]
        if labels.ndim == 2:  # [K, B] superbatch
            m = eval_superstep(state.params, state.batch_stats, batch)
            bsz = np.full(labels.shape[0], labels.shape[1], dtype=np.int64)
        else:
            m = eval_step(state.params, state.batch_stats, batch)
            bsz = np.array([labels.shape[0]], dtype=np.int64)
        device_metrics.append(m)
        sizes.append(bsz)
        if bi == warmup_batches - 1:
            _last_loss(m)  # drain warmup+compile, then start the clock
            t_warm = time.perf_counter()
        elif bi >= warmup_batches:
            timed_dispatches += 1
            timed_images += int(bsz.sum())
            timed_batches += len(bsz)
            if sync_every > 0 and timed_dispatches % sync_every == 0:
                _last_loss(m)
    if device_metrics:
        _last_loss(device_metrics[-1])  # block on the whole chain
    t_end = time.perf_counter()
    epoch_s = t_end - t_epoch0
    batch_times = ([(t_end - t_warm) / timed_batches] if timed_batches
                   else [])

    # top-k stay device-side during the loop; one bulk fetch afterwards
    # (per-scalar float() is a host round trip each, see loop.drain())
    fetched = jax.device_get(device_metrics)
    n = int(sum(int(b.sum()) for b in sizes))
    totals = {
        key: float(sum((np.asarray(d[key], dtype=np.float64) * b).sum()
                       for d, b in zip(fetched, sizes)))
        for key in ("loss", "top1", "top3", "top5")
    }

    try:
        stats = jax.local_devices()[0].memory_stats()
        mem_gib = float(stats.get("bytes_in_use", 0)) / (1024**3)
        peak_gib = float(stats.get("peak_bytes_in_use", 0)) / (1024**3)
    except Exception:
        mem_gib = peak_gib = float("nan")

    metrics = {
        "loss": totals["loss"] / max(1, n),
        "top1": totals["top1"] / max(1, n),
        "top3": totals["top3"] / max(1, n),
        "top5": totals["top5"] / max(1, n),
        # steady-state rate over the post-warmup window (compile excluded;
        # whole-epoch wall time incl. compile is in epoch_seconds)
        "imgs_per_sec": (timed_images / max(t_end - t_warm, 1e-9)
                         if timed_batches else n / max(epoch_s, 1e-9)),
        "ms_per_batch": 1000.0 * float(np.mean(batch_times)) if batch_times else float("nan"),
        "epoch_seconds": epoch_s,
        "num_images": n,
        "params": n_params,
        "param_size_mb": size_mb,
        "flops_fwd": flops,
        "mem_gib": mem_gib,
        "mem_peak_gib": peak_gib,
    }
    if verbose:
        print(
            f"[bench] params {n_params:,} ({size_mb:.2f} MB) | "
            f"flops/fwd {format_ops(flops)}"
        )
        print(
            f"[bench] loss {metrics['loss']:.4f} | top1 {metrics['top1']:.2f}% | "
            f"top3 {metrics['top3']:.2f}% | top5 {metrics['top5']:.2f}%"
        )
        print(
            f"[bench] {metrics['imgs_per_sec']:.1f} imgs/s | "
            f"{metrics['ms_per_batch']:.2f} ms/batch | epoch {epoch_s:.2f} s | "
            f"mem {mem_gib:.2f} GiB (peak {peak_gib:.2f})"
        )
    return metrics
