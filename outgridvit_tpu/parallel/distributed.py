"""Multi-process (multi-host) execution layer.

The reference is strictly single-process — "Single-process train loop (no
DDP, no EMA)" (`/root/reference/src/training/one_epoch_train.py:31`) — and
has no distributed backend at all (SURVEY §2). SURVEY §5 specifies the
TPU-native equivalent this module provides: ``jax.distributed`` bring-up,
per-host input pipelines feeding ``jax.make_array_from_process_local_data``,
and process-0-only logging/checkpoint writes, with GSPMD inserting the
actual collectives over ICI/DCN inside ``jit``.

Contract: in multi-process mode every process runs the SAME program over
the SAME global mesh (``jax.devices()`` is the global device list). Data
is the only per-process thing — each process's loader yields its own rows
of every global batch (``ArrayDataLoader(process_id=, process_count=)``),
assembled into global arrays by ``put_global`` / the ``Prefetcher``. Train
state is identical across processes by construction (same seed -> same
init) and placed on the mesh with ``shard_train_state``, which handles
cross-process shardings via ``jax.make_array_from_callback``.

Offline validation (no multi-host TPU needed): each process forces the
CPU platform with N virtual devices; Gloo backs the cross-process
collectives (`tests/test_distributed.py`, ``__graft_entry__.py
--mp-worker``).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Idempotent ``jax.distributed`` bring-up.

    Arguments fall back to ``OUTGRIDVIT_COORDINATOR`` /
    ``OUTGRIDVIT_NUM_PROCESSES`` / ``OUTGRIDVIT_PROCESS_ID`` (so launchers
    can configure workers purely through the environment, the way
    torchrun does for the torch world). A world of one — or no
    configuration at all — is a no-op returning False; anything else
    initializes the coordination service and returns True.

    Must be called before any jax backend initialization on TPU pods
    (jax.distributed's own requirement).
    """
    coord = coordinator_address or os.environ.get("OUTGRIDVIT_COORDINATOR")
    nproc = num_processes if num_processes is not None else int(
        os.environ.get("OUTGRIDVIT_NUM_PROCESSES", "0") or 0)
    pid = process_id if process_id is not None else int(
        os.environ.get("OUTGRIDVIT_PROCESS_ID", "-1") or -1)

    if not coord and nproc in (0, 1):
        return False  # single-process: nothing to do

    import jax

    # NOTE: must not touch the backend here (jax.process_count() would
    # initialize XLA, and jax.distributed.initialize refuses to run after
    # that); is_initialized() only inspects the coordination client.
    if jax.distributed.is_initialized():  # already initialized
        return True
    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
    if nproc:
        kwargs["num_processes"] = nproc
    if pid >= 0:
        kwargs["process_id"] = pid
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return True


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def is_main_process() -> bool:
    """True on the process that should log and write files (reference
    prints/saves unconditionally because it is single-process;
    `train_full_model.py:202-285`)."""
    return process_index() == 0


def local_row_slice(global_batch_size: int,
                    pid: Optional[int] = None,
                    pcount: Optional[int] = None) -> slice:
    """Rows of every global batch owned by this process.

    Matches ``jax.make_array_from_process_local_data``'s assembly order:
    the global batch axis is laid out over ``jax.devices()``, which orders
    devices by process index, so process ``p`` holds rows
    ``[p*B/P, (p+1)*B/P)``.
    """
    p = process_index() if pid is None else int(pid)
    n = process_count() if pcount is None else int(pcount)
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes")
    loc = global_batch_size // n
    return slice(p * loc, (p + 1) * loc)


def warmup_collectives() -> None:
    """Establish the cross-process collective context with one tiny
    all-reduce over every device, right after ``initialize``.

    The CPU backend's Gloo context is created lazily at the FIRST
    collective and has a hard 30s key-exchange deadline; if the first
    collective sits behind a minutes-long model compile whose duration
    differs across processes (a loaded CI box), one side times out. This
    tiny program compiles in ~1s on every process while they are still in
    lockstep from ``initialize``'s connection barrier, and every later
    program reuses the established context. No-op single-process; cheap
    and harmless on real TPU pods."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    if jax.process_count() == 1:
        return
    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("all",))
    sh = NamedSharding(mesh, PartitionSpec("all"))
    local = np.ones((len(jax.local_devices()),), np.float32)
    arr = jax.make_array_from_process_local_data(sh, local)
    total = jax.jit(jnp.sum,
                    out_shardings=NamedSharding(mesh, PartitionSpec()))(arr)
    assert float(total) == len(devs), "collective warmup mismatch"


def shard_loader_for_process(loader):
    """Configure an ``ArrayDataLoader`` (in place) to yield only this
    process's rows of every global batch — the per-host input pipeline of
    SURVEY §5. The loader's ``batch_size`` stays the GLOBAL batch;
    ``drop_last`` is forced (a ragged global tail cannot shard evenly
    over a cross-process mesh). No-op in a single-process world or for
    ``None`` (absent val loaders)."""
    n = process_count()
    if loader is None or n == 1:
        return loader
    if loader.batch_size % n != 0:
        raise ValueError(
            f"global batch {loader.batch_size} not divisible by {n} "
            "processes")
    loader.process_count = n
    loader.process_id = process_index()
    loader.drop_last = True
    return loader


def put_global(local_batch, sharding):
    """Assemble a global device array from this process's local rows.

    Single-process: a plain ``device_put``. Multi-process: every process
    contributes its shard via ``jax.make_array_from_process_local_data``
    (SURVEY §5's named mechanism) — there is no unsharded fallback,
    because a process-local array cannot feed a global SPMD computation.
    """
    import jax

    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def put_replicated_global(host_value, sharding):
    """Place a host value EVERY process holds in full onto an arbitrary
    (possibly cross-process) sharding.

    Used by ``shard_train_state`` in multi-process mode: params are
    identical on all processes (same seed -> same init / same restored
    checkpoint), and ``make_array_from_callback`` lets each process slice
    out exactly the shards its devices own — including tensor-parallel
    splits that span processes, which ``device_put`` cannot address.
    """
    import jax

    if jax.process_count() == 1:
        return jax.device_put(host_value, sharding)
    arr = np.asarray(host_value)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])


def replicate_to_host(x):
    """Fetch a (possibly cross-process-sharded) jax.Array to host numpy.

    Fully-addressable / fully-replicated arrays fetch directly. A
    cross-process-sharded array is first all-gathered to replication by a
    jit identity with replicated out_shardings — a COLLECTIVE: in
    multi-process mode every process must call this (checkpoint saves do,
    `training/checkpoints.py`), after which the fetch is local.
    """
    import jax

    if not isinstance(x, jax.Array):
        return x
    if x.is_fully_addressable or x.is_fully_replicated:
        return jax.device_get(x)
    sh = x.sharding
    mesh = getattr(sh, "mesh", None)
    if mesh is None:  # pragma: no cover - non-named shardings
        raise ValueError(f"cannot gather array with sharding {sh}")
    from jax.sharding import NamedSharding, PartitionSpec

    gathered = jax.jit(
        lambda a: a, out_shardings=NamedSharding(mesh, PartitionSpec()))(x)
    return jax.device_get(gathered)
