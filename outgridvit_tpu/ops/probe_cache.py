"""Shared disk cache for kernel compile-probe verdicts.

Dispatch for every Pallas kernel family (lane-batched attention, fused
dw-conv backward, fused outlook aggregate) asks the COMPILER whether the
exact shape is feasible — an AOT ``jit(grad(...)).lower().compile()`` —
instead of extrapolating VMEM use from a heuristic (the class of bug
fixed in commit a336fd5). A probe costs seconds, so verdicts are cached
in-process and on disk, keyed ``<backend>:<kind>:<shape...>:<dtype>``.

Writes merge with the on-disk state first (two concurrent processes
probing different shapes both keep their entries) and replace the file
atomically; a read-only filesystem degrades to the in-process cache.
"""

from __future__ import annotations

import json
import os

_PROBE_DISK: dict | None = None


def _probe_cache_path() -> str:
    return os.environ.get(
        "OUTGRIDVIT_PROBE_CACHE",
        os.path.expanduser("~/.cache/outgridvit/attn_probe.json"))


def _read_disk() -> dict:
    try:
        with open(_probe_cache_path()) as f:
            return dict(json.load(f))
    except (OSError, ValueError):
        return {}


def _probe_disk_load() -> dict:
    global _PROBE_DISK
    if _PROBE_DISK is None:
        _PROBE_DISK = _read_disk()
    return _PROBE_DISK


def _probe_disk_save(key: str, ok: bool) -> None:
    cache = _probe_disk_load()
    cache[key] = bool(ok)
    path = _probe_cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # merge with concurrent writers before replacing (last-writer-wins
        # per KEY, not per file)
        merged = _read_disk()
        merged.update(cache)
        cache.update(merged)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(merged, f)
        os.replace(tmp, path)
    except OSError:
        pass  # read-only FS etc.: in-process cache still holds the verdict


def _device_kind_tag() -> str:
    """Normalized device kind of the default backend (e.g. 'TPU-v5-lite').

    VMEM ceilings differ across TPU generations, so a feasibility verdict
    cached on one generation must not be reused on another through the
    shared on-disk cache. Keying every probe on the device kind (added
    here centrally rather than in each ``*_feasible`` gate) makes
    verdicts per-generation."""
    try:
        import jax

        return str(jax.devices()[0].device_kind).replace(" ", "-")
    except Exception:  # backend not initialized / no devices
        return "unknown"


def cached_probe(key: str, compile_fn) -> bool:
    """Disk-cached compile probe: returns the cached verdict for ``key``
    or runs ``compile_fn()`` (which must raise on infeasible shapes),
    records and returns the outcome. Used by every kernel family's
    ``*_feasible`` dispatch gate. The key is automatically suffixed with
    the device kind so verdicts are per TPU generation."""
    key = f"{key}:{_device_kind_tag()}"
    disk = _probe_disk_load()
    if key in disk:
        return bool(disk[key])
    try:
        compile_fn()
        ok = True
    except Exception:  # noqa: BLE001 — any compile failure = infeasible
        ok = False
    _probe_disk_save(key, ok)
    return ok
