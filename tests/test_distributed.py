"""Multi-process execution (SURVEY §5: jax.distributed + per-host input
pipelines + process-0 gating) validated offline: spawned CPU processes
with Gloo collectives must reproduce the single-process run exactly.

The reference has no distributed layer at all ("Single-process train loop",
`/root/reference/src/training/one_epoch_train.py:31`); this is the
beyond-reference TPU-native bar the blueprint declares.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]
WORKER = ROOT / "tests" / "mp_train_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(pid, nproc, port, outdir, local_devices):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    for k in ("OUTGRIDVIT_COORDINATOR", "OUTGRIDVIT_NUM_PROCESSES",
              "OUTGRIDVIT_PROCESS_ID"):
        env.pop(k, None)
    return subprocess.Popen(
        [sys.executable, str(WORKER), str(pid), str(nproc), str(port),
         str(outdir)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def test_loader_process_split_covers_global_batches():
    """Concatenating the per-process loaders' rows (in process order) must
    reproduce the unsharded loader's global batches exactly — the
    contract make_array_from_process_local_data assembles by."""
    from outgridvit_tpu.data.pipeline import ArrayDataLoader

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (37, 4, 4, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, size=(37,))

    def make(pid=None, pcount=None):
        return ArrayDataLoader(images, labels, batch_size=8, shuffle=True,
                               seed=3, num_threads=1,
                               process_id=pid, process_count=pcount)

    ref = make()
    ref.drop_last = True  # distributed mode forces drop_last
    ref.set_epoch(2)
    parts = [make(pid, 2) for pid in range(2)]
    for p in parts:
        p.set_epoch(2)
    ref_batches = list(ref)
    split_batches = [list(p) for p in parts]
    assert len(ref_batches) == len(split_batches[0]) == len(split_batches[1])
    for (gx, gy), (x0, y0), (x1, y1) in zip(ref_batches, *split_batches):
        np.testing.assert_array_equal(np.concatenate([x0, x1]), gx)
        np.testing.assert_array_equal(np.concatenate([y0, y1]), gy)

    # indivisible global batch is rejected
    with pytest.raises(ValueError):
        ArrayDataLoader(images, labels, batch_size=9, process_id=0,
                        process_count=2)


def test_local_row_slice_partitions_batch():
    from outgridvit_tpu.parallel.distributed import local_row_slice

    slices = [local_row_slice(12, pid=p, pcount=3) for p in range(3)]
    rows = np.arange(12)
    np.testing.assert_array_equal(
        np.concatenate([rows[s] for s in slices]), rows)
    with pytest.raises(ValueError):
        local_row_slice(10, pid=0, pcount=3)


def test_two_process_train_matches_single_process(tmp_path):
    """THE multi-process guarantee: 2 spawned processes (2 virtual devices
    each, jax.distributed + Gloo, per-process data feeding, process-0
    logging/checkpointing) running the REAL train_model loop must produce
    the same per-epoch losses, val metrics, and final params as one
    process with 4 virtual devices."""
    # single-process reference: same worker, world of one, 4 local devices
    p = _spawn(0, 1, 0, tmp_path, local_devices=4)
    out1 = p.communicate(timeout=900)[0]
    assert p.returncode == 0, out1[-3000:]

    # two processes x 2 local devices over one jax.distributed world
    port = _free_port()
    procs = [_spawn(pid, 2, port, tmp_path, local_devices=2)
             for pid in range(2)]
    outs = [q.communicate(timeout=900)[0] for q in procs]
    for pid, (q, out) in enumerate(zip(procs, outs)):
        assert q.returncode == 0, f"worker {pid}:\n{out[-3000:]}"

    r1 = json.loads((tmp_path / "result_1p.json").read_text())
    r2 = json.loads((tmp_path / "result_2p.json").read_text())
    assert r1["step"] == r2["step"] == 8  # 2 epochs x 4 global batches
    np.testing.assert_allclose(r2["train_loss"], r1["train_loss"],
                               rtol=2e-4)
    np.testing.assert_allclose(r2["val_loss"], r1["val_loss"], rtol=2e-4)
    np.testing.assert_allclose(r2["val_top1"], r1["val_top1"], atol=1e-6)
    np.testing.assert_allclose(r2["param_checksum"], r1["param_checksum"],
                               rtol=2e-4)
    assert r2["ckpt_exists"]  # written by process 0 only

    # process 0 logs; process 1 stays silent
    assert "=== Run config ===" in outs[0]
    assert "[Train]" in outs[0]
    assert "[Train]" not in outs[1]
    assert "=== Run config ===" not in outs[1]
