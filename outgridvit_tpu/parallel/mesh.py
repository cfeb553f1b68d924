"""Device mesh + sharding rules: the TPU-native scaling layer.

The reference has no distributed layer at all (SURVEY.md §2: no DDP/TP/PP).
Here scaling is first-class and GSPMD-style: pick a Mesh, place the batch on
the ``data`` axis and (optionally) the wide MLP/attention projections on the
``model`` axis, and let XLA insert the collectives (gradient all-reduce and
cross-device BatchNorm statistics come out of jit automatically — the mean
over a 'data'-sharded batch axis IS the global mean).

Axes:
- ``data``  — batch-dim data parallelism over ICI (the workhorse for this
  model family; grid attention's B*g^2 batch dim shards for free with it).
- ``model`` — tensor parallelism for the channel-MLP hidden dim, the fused
  qkv projection, and the classifier; modest dims here, so this is off
  (model=1) by default and exists for scale-out of bigger configs.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices. Default: all devices on
    'data', 1 on 'model'."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != #devices {n}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def superbatch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for [K, B, ...] stacked batches (K scanned steps per
    dispatch): the scan axis stays replicated, the batch axis shards."""
    return NamedSharding(mesh, P(None, axis))


# Parameter partitioning rules for tensor parallelism. Matched against the
# "/"-joined flax param path. Column-parallel on the hidden/out dim for the
# up-projections, row-parallel on the in dim for the down-projections.
_TP_RULES = [
    (re.compile(r"mlp/fc1/kernel$"), P(None, "model")),
    (re.compile(r"mlp/fc1/bias$"), P("model")),
    (re.compile(r"mlp/fc2/kernel$"), P("model", None)),
    (re.compile(r"qkv/kernel$"), P(None, "model")),
    (re.compile(r"qkv/bias$"), P("model")),
    (re.compile(r"(grid_attn/mhsa|attn)/proj/kernel$"), P("model", None)),
    (re.compile(r"mbconv/expand/kernel$"), P(None, "model")),
    (re.compile(r"mbconv/expand/bias$"), P("model")),
    (re.compile(r"mbconv/project/kernel$"), P("model", None)),
    (re.compile(r"classifier/kernel$"), P(None, "model")),
    (re.compile(r"classifier/bias$"), P("model")),
]


def param_pspec(path: Tuple, leaf, model_axis_size: int) -> P:
    """PartitionSpec for one param leaf. Replicate everything when the model
    axis is trivial or the dim doesn't divide."""
    if model_axis_size <= 1:
        return P()
    name = "/".join(
        getattr(k, "key", getattr(k, "name", str(k))) for k in path
    )
    for rule, spec in _TP_RULES:
        if rule.search(name):
            # only shard if every named dim divides
            ok = True
            for dim, ax in zip(leaf.shape, spec):
                if ax == "model" and dim % model_axis_size != 0:
                    ok = False
            if ok:
                return spec
    return P()


def state_shardings(state, mesh: Mesh):
    """NamedSharding pytree for a whole TrainState. The TP path rules match
    both ``params`` leaves and the optimizer-moment leaves (whose flattened
    paths end with the same ``.../mlp/fc1/kernel`` suffix), so one walk covers
    params, opt_state, batch_stats (no rule -> replicated) and step."""
    model_size = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, param_pspec(path, leaf, model_size)
        ),
        state,
    )


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState on the mesh with TP rules on params + optimizer
    moments and replication for everything else. jit preserves these
    shardings; GSPMD inserts the collectives.

    Single-process: one ``device_put``. Multi-process (mesh spanning
    processes): every process holds the full state (same seed -> same
    init / same restored checkpoint), so each leaf is placed with
    ``put_replicated_global``, which slices out exactly the shards this
    process's devices own (parallel/distributed.py)."""
    shardings = state_shardings(state, mesh)
    if jax.process_count() == 1:
        return jax.device_put(state, shardings)
    from outgridvit_tpu.parallel.distributed import put_replicated_global

    return jax.tree_util.tree_map(put_replicated_global, state, shardings)
