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

import re
from typing import Dict, Optional, Tuple

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


# ----------------------------------------------------- HLO traffic account
#
# XLA's cost_analysis() "bytes accessed" models operand/result bytes of the
# UNFUSED graph — it excludes the intermediates the compiled program
# actually materializes, so HBM utilization computed from it is a floor
# (round-4 verdict: that made the roofline claim unfalsifiable). The
# accounting below reads the OPTIMIZED HLO of the exact compiled program:
# on TPU every top-level HLO op streams its operands from HBM and writes
# its result back (VMEM persists only inside a fusion), so
#   traffic = sum over executed top-level ops of (operand bytes + result bytes)
# is the program's real HBM traffic, modulo physical layout padding (logical
# sizes are counted, a slight underestimate) and any operand XLA keeps
# resident across ops (rare at these working-set sizes).

_DTYPE_BYTES = {
    "pred": 1, "s2": 1, "u2": 1, "s4": 1, "u4": 1, "s8": 1, "u8": 1,
    "f8e4m3": 1, "f8e5m2": 1, "f8e4m3fn": 1, "f8e4m3b11fnuz": 1,
    "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "c64": 8,
    "s64": 8, "u64": 8, "f64": 8, "c128": 16,
}

_ARRAY_SHAPE_RE = re.compile(
    r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([\d,]*)\](\{[^}]*\})?")

# ops that move no HBM bytes themselves (reads are charged to consumers)
_FREE_OPS = {
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "after-all",
}


def _shape_bytes(shape_str: str) -> int:
    """HBM byte size of an HLO result shape (tuples sum elements).

    Buffers whose layout carries a non-default memory space — ``S(1)``
    VMEM-pinned by memory-space assignment, ``S(2)`` scratch/semaphore,
    host spaces — do not live in HBM and count zero."""
    total = 0
    for m in _ARRAY_SHAPE_RE.finditer(shape_str):
        layout = m.group(3) or ""
        if "S(" in layout and "S(0)" not in layout:
            continue
        n = _DTYPE_BYTES[m.group(1)]
        dims = m.group(2)
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n
    return total


def _tuple_elements(shape_str: str):
    """Split a tuple shape into top-level element strings; a non-tuple
    shape returns [shape_str]."""
    s = shape_str.strip()
    if not s.startswith("("):
        return [s]
    inner = s[1:-1] if s.endswith(")") else s[1:]
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(inner):
        depth += ch in "({"
        depth -= ch in ")}"
        if ch == "," and depth == 0:
            parts.append(inner[start:i])
            start = i + 1
    parts.append(inner[start:])
    return [p.strip() for p in parts if p.strip()]


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)$")
_OPCODE_RE = re.compile(r"^([a-z][\w\-]*)\(")


def _parse_instruction(line: str):
    """(name, result_shape_str, opcode, operand_names) or None."""
    m = _INSTR_RE.match(line)
    if not m:
        return None
    name, rest = m.group(1), m.group(2)
    # result shape: a tuple "( ... )" (paren-matched) or one token
    if rest.startswith("("):
        depth = 0
        for i, ch in enumerate(rest):
            depth += ch == "("
            depth -= ch == ")"
            if depth == 0:
                break
        shape, rest = rest[: i + 1], rest[i + 1:].lstrip()
    else:
        parts = rest.split(" ", 1)
        shape, rest = parts[0], parts[1] if len(parts) > 1 else ""
    om = _OPCODE_RE.match(rest)
    if om is None:
        return None
    opcode = om.group(1)
    # operand section: matched parens after the opcode
    depth, start = 0, om.end() - 1
    for i in range(start, len(rest)):
        depth += rest[i] == "("
        depth -= rest[i] == ")"
        if depth == 0:
            break
    operands = re.findall(r"%([\w.\-]+)", rest[start: i + 1])
    return name, shape, opcode, operands


def hlo_hbm_traffic(hlo_text: str, default_trip: int = 1) -> Dict:
    """HBM traffic (bytes) of an optimized-HLO program.

    Counts ENTRY instructions once; `while` bodies/conditions are counted
    ``default_trip`` times (a lax.scan superstep lowers to one while with a
    known trip count — pass K). Fusion-internal computations never touch
    HBM and are excluded; the fusion op itself is charged its operands +
    result. Returns reads/writes/total plus bookkeeping for sanity checks.
    """
    computations: Dict[str, list] = {}
    comp_attrs: Dict[str, Dict[str, str]] = {}
    current = None
    for raw in hlo_text.splitlines():
        line = raw.rstrip()
        header = re.match(r"^\s*(ENTRY\s+)?%?([\w.\-]+)\s*\(.*\)\s*->", line)
        if header and line.rstrip().endswith("{"):
            current = "ENTRY" if header.group(1) else header.group(2)
            computations[current] = []
            continue
        if line.strip() == "}":
            current = None
            continue
        if current is not None and "=" in line:
            parsed = _parse_instruction(line)
            if parsed:
                computations[current].append(parsed)
                if parsed[2] == "while":
                    body = re.search(r"body=%?([\w.\-]+)", line)
                    cond = re.search(r"condition=%?([\w.\-]+)", line)
                    comp_attrs[parsed[0]] = {
                        "body": body.group(1) if body else None,
                        "cond": cond.group(1) if cond else None,
                    }

    if "ENTRY" not in computations:
        return {"total_bytes": None, "note": "no ENTRY computation parsed"}

    def comp_traffic(comp_name: str, shapes: Dict[str, str]):
        reads = writes = 0
        whiles = []
        for name, shape, opcode, operands in computations.get(comp_name, []):
            shapes[name] = shape
            if opcode in _FREE_OPS or opcode.endswith("-done"):
                # -done retrieves what its matching -start already moved
                continue
            if opcode == "copy-start":
                # result = (dest, src-alias, scratch): only dest is written
                writes += _shape_bytes(_tuple_elements(shape)[0])
            elif opcode.endswith("-start"):
                # async family: result = ((operand aliases), outputs...,
                # scratch) — aliases moved nothing; charge outputs only
                for el in _tuple_elements(shape)[1:]:
                    writes += _shape_bytes(el)
            else:
                writes += _shape_bytes(shape)
            for op in operands:
                reads += _shape_bytes(shapes.get(op, ""))
            if opcode == "while":
                whiles.append(name)
        return reads, writes, whiles

    shapes: Dict[str, str] = {}
    # pre-register every instruction's shape so cross-computation operand
    # lookups (while init from ENTRY, etc.) resolve
    for comp in computations.values():
        for name, shape, _, _ in comp:
            shapes[name] = shape

    reads, writes, whiles = comp_traffic("ENTRY", shapes)
    n_while_body_bytes = 0
    for w in whiles:
        attrs = comp_attrs.get(w, {})
        for sub in (attrs.get("body"), attrs.get("cond")):
            if sub and sub in computations:
                r, wr, _nested = comp_traffic(sub, shapes)
                n_while_body_bytes += (r + wr) * default_trip
                reads += r * default_trip
                writes += wr * default_trip

    return {
        "read_bytes": reads,
        "write_bytes": writes,
        "total_bytes": reads + writes,
        "n_entry_instructions": len(computations["ENTRY"]),
        "n_while": len(whiles),
        "while_trip_assumed": default_trip if whiles else None,
    }


def compiled_hbm_traffic(jitted_fn, *args, default_trip: int = 1,
                         **kwargs) -> Optional[Dict]:
    """hlo_hbm_traffic of the compiled program for these args (compile hits
    the executable cache when the fn already ran on these shapes)."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        return hlo_hbm_traffic(compiled.as_text(), default_trip=default_trip)
    except Exception:  # noqa: BLE001 — best-effort context
        return None


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
