"""MFU / roofline context for benchmark numbers.

The reference publishes FLOPs alongside every throughput figure
(`src/training/eval_one_epoch_logs.py:34-55`); this module goes one step
further and grounds measured step times against the chip's peak matmul
rate (MFU) and HBM bandwidth (bytes-roofline utilization), so "done
optimizing" is a measurement, not a narrative (docs/PERFORMANCE.md).

FLOPs/bytes come from XLA's own compiled-program cost analysis
(``jit(f).lower(...).compile().cost_analysis()``), i.e. the *actual*
program being timed — including fused augmentation, optimizer and
metrics — not an isolated forward.

Peak figures are public per-chip numbers (bf16 dense FLOP/s, HBM GB/s):
TPU v4 275T/1228G, v5e 197T/819G, v5p 459T/2765G, v6e 918T/1640G.
Unknown device kinds degrade to ``mfu=None`` rather than guessing.
"""

from __future__ import annotations

from typing import Optional, Tuple

# device_kind substring (lowercase) -> (peak bf16 FLOP/s, HBM bytes/s).
# Ordered: first match wins, so more specific strings come first.
_CHIP_SPECS = (
    ("v6e", (918e12, 1640e9)),
    ("v6 lite", (918e12, 1640e9)),
    ("v5p", (459e12, 2765e9)),
    ("v5e", (197e12, 819e9)),
    ("v5 lite", (197e12, 819e9)),
    ("v4", (275e12, 1228e9)),
)


def chip_peaks(device=None) -> Tuple[Optional[float], Optional[float], str]:
    """(peak_bf16_flops_per_s, hbm_bytes_per_s, device_kind) for ``device``
    (default: first jax device). Unknown kinds return (None, None, kind)."""
    import jax

    if device is None:
        devs = jax.devices()
        if not devs:
            return None, None, "none"
        device = devs[0]
    kind = str(getattr(device, "device_kind", "unknown"))
    low = kind.lower()
    for sub, peaks in _CHIP_SPECS:
        if sub in low:
            return peaks[0], peaks[1], kind
    return None, None, kind


def compiled_cost(jitted_fn, *args, **kwargs) -> Tuple[Optional[float],
                                                       Optional[float]]:
    """(flops, bytes_accessed) of the compiled program for these args, from
    XLA cost analysis. Returns (None, None) when the backend doesn't
    support cost analysis (compile itself hits the executable cache when
    the fn has already run on these shapes)."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returned [dict]
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", -1.0))
        nbytes = float(cost.get("bytes accessed", -1.0))
        return (flops if flops > 0 else None,
                nbytes if nbytes > 0 else None)
    except Exception:  # noqa: BLE001 — cost analysis is best-effort context
        return None, None


def roofline_report(
    flops_per_step: Optional[float],
    bytes_per_step: Optional[float],
    step_time_s: float,
    n_chips: int = 1,
    device=None,
) -> dict:
    """MFU + HBM-roofline utilization for a measured per-dispatch time.

    ``mfu`` = achieved FLOP/s / peak bf16 FLOP/s; ``hbm_util`` = achieved
    HBM bytes/s / peak bandwidth — both per chip. A bytes-bound program
    shows hbm_util near 1 with a small mfu; that is the roofline saying
    the kernel is at speed-of-light for its arithmetic intensity."""
    peak_flops, peak_bw, kind = chip_peaks(device)
    out = {
        "device_kind": kind,
        "step_ms": round(1e3 * step_time_s, 3),
        "flops_per_step": flops_per_step,
        "bytes_per_step": bytes_per_step,
        "mfu": None,
        "hbm_util": None,
    }
    denom = max(step_time_s, 1e-12) * max(1, n_chips)
    if flops_per_step and peak_flops:
        out["mfu"] = round(flops_per_step / denom / peak_flops, 4)
    if bytes_per_step and peak_bw:
        out["hbm_util"] = round(bytes_per_step / denom / peak_bw, 4)
    if flops_per_step and bytes_per_step:
        # arithmetic intensity + the machine balance point for context
        out["flops_per_byte"] = round(flops_per_step / bytes_per_step, 2)
        if peak_flops and peak_bw:
            out["machine_balance_flops_per_byte"] = round(
                peak_flops / peak_bw, 2)
    return out
