"""Accuracy metrics (reference `src/training/metrics.py:8-24`): top-k with
soft targets accepted via argmax."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accuracy_topk(logits: jnp.ndarray, targets: jnp.ndarray, ks=(1, 3, 5)):
    """Returns {k: percent correct in top-k} as traced fp32 scalars."""
    if targets.ndim == 2:
        targets = targets.argmax(axis=-1)
    num_classes = logits.shape[-1]
    max_k = min(max(ks), num_classes)  # k cannot exceed the class count
    _, pred = jax.lax.top_k(logits, max_k)  # [B, max_k]
    correct = pred == targets[:, None].astype(pred.dtype)
    out = {}
    for k in ks:
        kk = min(k, num_classes)
        out[k] = 100.0 * correct[:, :kk].any(axis=-1).astype(jnp.float32).mean()
    return out


def free_device_memory(verbose: bool = True) -> None:
    """Best-effort device-memory release for notebook workflows (the
    reference's `free_all_cuda`, `src/training/metrics.py:27-49`). In
    functional JAX, dropping array references is what frees HBM; this
    clears compilation caches and runs the GC."""
    import gc

    import jax

    gc.collect()
    jax.clear_caches()
    if verbose:
        try:
            stats = jax.local_devices()[0].memory_stats()
            used = stats.get("bytes_in_use", 0) / (1024**2)
            print(f"[device] in use: {used:.1f} MB")
        except Exception:
            print("[device] memory stats unavailable")
