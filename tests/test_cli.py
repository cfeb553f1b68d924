"""End-to-end CLI tests: spawn `scripts/train.py` as a user would.

The rest of the suite calls `train_model` directly; these tests pin the
arg-plumbing/YAML surface itself (reference `scripts/train.py:135-186`):
exit code, parseable log lines, checkpoint files — and, for the CIFAR case,
the full real-data path (pickle -> loader -> host augment -> train ->
resume) against the same fixture layout the data tests use.
"""

import os
import pickle
import re
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

ROOT = Path(__file__).resolve().parents[1]

# log-line shapes the reference prints (train_full_model.py:136-146,202-258)
TRAIN_LINE = re.compile(
    r"\[Train\] loss (\d+\.\d+) \| top1 (\d+\.\d+)% \| top3 (\d+\.\d+)% "
    r"\| top5 (\d+\.\d+)%")
VAL_LINE = re.compile(r"\[Val\]\s+loss (\d+\.\d+) \| top1 (\d+\.\d+)%")


def _run_cli(args, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # single CPU device: fastest for a subprocess
    proc = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "train.py"), *args],
        cwd=str(ROOT), env=env, capture_output=True, text=True,
        timeout=timeout)
    assert proc.returncode == 0, (
        f"train.py exited {proc.returncode}\n--- stdout ---\n"
        f"{proc.stdout[-4000:]}\n--- stderr ---\n{proc.stderr[-4000:]}")
    return proc.stdout


def test_train_cli_synthetic_smoke(tmp_path):
    """`scripts/train.py --config configs/smoke_synthetic.yaml` as a
    subprocess: exit 0, reference-format log lines, checkpoint written."""
    out = _run_cli([
        "--config", str(ROOT / "configs" / "smoke_synthetic.yaml"),
        "--output-dir", str(tmp_path),
    ])
    m = TRAIN_LINE.search(out)
    assert m, f"no parseable [Train] line in:\n{out[-2000:]}"
    assert 0.0 <= float(m.group(2)) <= 100.0
    assert "=== Epoch 1/1 ===" in out
    assert (tmp_path / "last_smoke.ckpt").exists()


def _write_cifar_fixture(data_dir: Path, n_train=256, n_test=64, classes=10,
                         seed=0):
    """Standard cifar-100-python pickle layout (the loader's expectation,
    outgridvit_tpu/data/datasets.py:_load_cifar100_raw; same fixture shape
    as tests/test_data.py's prepare_data check)."""
    base = data_dir / "cifar-100-python"
    base.mkdir(parents=True)
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("test", n_test)):
        payload = {
            b"data": rng.integers(0, 255, (n, 3072), dtype=np.uint8),
            b"fine_labels": (np.arange(n) % classes).tolist(),
        }
        with open(base / split, "wb") as f:
            pickle.dump(payload, f)


@pytest.fixture
def cifar_cli_config(tmp_path):
    data_dir = tmp_path / "data"
    _write_cifar_fixture(data_dir)
    cfg = {
        "model": {
            "type": "model_a", "num_classes": 10, "in_ch": 3,
            "stem_dim": 16, "dpr_max": 0.0,
            "stages": [
                {"dim": 16, "depth": 1, "num_heads": 2, "grid_size": 4,
                 "outlook_heads": 2},
                {"dim": 32, "depth": 1, "num_heads": 2, "grid_size": 2,
                 "outlook_heads": 2},
            ],
        },
        "training": {
            "epochs": 1, "lr": 5e-4, "weight_decay": 0.05,
            "use_amp": False, "autocast_dtype": "fp32",
            "label_smoothing": 0.1, "mixup_alpha": 0.2,
            "cutmix_alpha": 1.0, "mix_prob": 0.5, "print_every": 4,
            "save_path": "best.ckpt", "last_path": "last.ckpt",
            "early_stop": False,
        },
        "data": {
            "dataset": "cifar100", "data_dir": str(data_dir),
            "batch_size": 32, "img_size": 32, "val_split": 0.25,
            "num_workers": 2,
        },
        "runtime": {"device": "cpu", "seed": 7,
                    "output_dir": str(tmp_path / "out")},
    }
    path = tmp_path / "cifar_fixture.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return path, tmp_path / "out"


def test_train_cli_cifar_pickles_and_resume(cifar_cli_config):
    """The real-data path end-to-end as a user would run it: CIFAR pickles
    -> loader -> host augmentation -> val split -> train -> checkpoints,
    then a second invocation resuming from last.ckpt
    (reference resume semantics: train_full_model.py:86-103)."""
    cfg_path, out_dir = cifar_cli_config

    out = _run_cli(["--config", str(cfg_path)])
    assert TRAIN_LINE.search(out), out[-2000:]
    assert VAL_LINE.search(out), out[-2000:]
    assert (out_dir / "last.ckpt").exists()
    assert (out_dir / "best.ckpt").exists()  # val split -> best tracking

    # resume continues at epoch 2 without retraining epoch 1
    out2 = _run_cli(["--config", str(cfg_path),
                     "--resume", str(out_dir / "last.ckpt"),
                     "--epochs", "2"])
    assert re.search(r"Resumed from .*last\.ckpt at epoch 1", out2), \
        out2[-2000:]
    assert "=== Epoch 2/2 ===" in out2
    assert "=== Epoch 1/2 ===" not in out2
