"""Checkpoint save / load with the reference's best/last/resume semantics
(`src/training/chekpoints.py`, `train_full_model.py:212-225,268-285`).

Single-file msgpack checkpoints (flax serialization) holding the full train
state (params, batch_stats, opt_state, step) plus scalar metadata — the
Orbax-style directory layout is unnecessary for single-host states of this
size, and a single file keeps the reference's "path.pt"-style CLI surface.
"""

from __future__ import annotations

import json
import struct as _struct
from pathlib import Path
from typing import Any, Dict, Optional

import jax
from flax import serialization

_MAGIC = b"OGVT"


def save_checkpoint(
    path: str,
    state,
    epoch: int,
    best_top1: float = float("-inf"),
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Serialize train-state arrays + metadata into one file.

    Multi-process: EVERY process must call this (the host fetch of
    cross-process-sharded leaves is a collective all-gather,
    `parallel/distributed.py:replicate_to_host`), but only process 0
    writes the file — SURVEY §5's process-0 gating."""
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if jax.process_count() > 1:
        from outgridvit_tpu.parallel.distributed import replicate_to_host

        host_tree = jax.tree_util.tree_map(replicate_to_host, tree)
        if jax.process_index() != 0:
            return
    else:
        host_tree = jax.device_get(tree)
    payload = serialization.msgpack_serialize(
        serialization.to_state_dict(host_tree)
    )
    meta = json.dumps(
        {"epoch": int(epoch), "best_top1": float(best_top1),
         "extra": extra or {}}
    ).encode("utf-8")
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "wb") as f:
        f.write(_MAGIC)
        f.write(_struct.pack("<Q", len(meta)))
        f.write(meta)
        f.write(payload)


def load_checkpoint(path: str, state=None) -> Dict[str, Any]:
    """Load a checkpoint. If ``state`` is given, returns
    {"state": restored_state, "epoch": ..., "best_top1": ..., "extra": ...};
    otherwise returns the raw tree in place of "state"."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path} is not an outgridvit_tpu checkpoint")
        (meta_len,) = _struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(meta_len).decode("utf-8"))
        payload = f.read()
    tree = serialization.msgpack_restore(payload)
    out = dict(meta)
    if state is not None:
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = serialization.from_state_dict(template, tree)
        out["state"] = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
    else:
        out["state"] = tree
    return out


def load_model_variables(path: str, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Restore ONLY params/batch_stats from a checkpoint into ``variables``.

    For eval-only consumers (benchmark/robustness/analysis CLIs): the
    checkpoint's optimizer state is ignored, so the caller's throwaway
    optimizer need not match the training-time optimizer tree."""
    raw = load_checkpoint(path)["state"]
    template = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    restored = serialization.from_state_dict(
        template,
        {"params": raw["params"], "batch_stats": raw.get("batch_stats", {})},
    )
    out = dict(variables)
    out["params"] = restored["params"]
    out["batch_stats"] = restored["batch_stats"]
    return out
