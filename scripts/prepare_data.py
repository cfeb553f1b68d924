#!/usr/bin/env python
"""Dataset provisioning: verify on-disk layouts, download when egress exists.

The reference downloads datasets implicitly (torchvision ``download=True``;
Tiny-ImageNet-C via a Zenodo tar, `src/data/load_tinyimagenet_C.py:109-131`).
This machine usually has no network egress, so every loader in
``outgridvit_tpu.data`` is offline-first and expects a documented directory
tree. This script is the single place those trees are written down, checked
(`--verify-only`) and — when a network IS available — provisioned.

Usage:
  python scripts/prepare_data.py --data-dir ./data                 # all
  python scripts/prepare_data.py --datasets cifar100 svhn          # subset
  python scripts/prepare_data.py --verify-only                     # no net
"""

from __future__ import annotations

import argparse
import sys
import tarfile
import urllib.request
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


# ------------------------------------------------------------------ helpers

def _download(url: str, dest: Path) -> Path:
    dest.parent.mkdir(parents=True, exist_ok=True)
    if dest.exists():
        print(f"  [cached] {dest}")
        return dest
    print(f"  [download] {url} -> {dest}")
    urllib.request.urlretrieve(url, dest)
    return dest


def _extract_tar(tar_path: Path, out_dir: Path) -> None:
    print(f"  [extract] {tar_path} -> {out_dir}")
    with tarfile.open(tar_path, "r:*") as tf:
        tf.extractall(out_dir)


def _check_tree(data_dir: Path, paths) -> tuple[bool, list[str]]:
    """Shared layout check: every ``paths`` entry must exist under one of the
    candidate roots (callers pass root-relative paths)."""
    missing = [str(p) for p in paths if not (data_dir / p).exists()]
    return (not missing), missing


def _save_hf(hf_name: str, data_dir: Path) -> None:
    """Fetch an HF dataset and normalize it to the offline ``save_to_disk``
    layout that ``datasets._load_hf_dataset`` probes first."""
    import datasets as hf_datasets

    out = data_dir / hf_name.split("/")[-1]
    ds = hf_datasets.load_dataset(hf_name)
    ds.save_to_disk(str(out))
    print(f"  [saved] {out}")


# ----------------------------------------------------------------- registry
#
# Each entry: expected tree (docs + verify), and a provision function that
# downloads/normalizes it. ``verify`` returns (ok, details).

def _verify_cifar100(d: Path):
    for cand in (d / "cifar-100-python", d):
        ok, _ = _check_tree(cand, ["train", "test"])
        if ok:
            return True, [str(cand)]
    return False, [f"{d}/cifar-100-python/{{train,test}}"]


def _provision_cifar100(d: Path):
    tar = _download(
        "https://www.cs.toronto.edu/~kriz/cifar-100-python.tar.gz",
        d / "cifar-100-python.tar.gz")
    _extract_tar(tar, d)


def _verify_svhn(d: Path):
    missing = []
    for split in ("train", "test"):
        if not any((c / f"{split}_32x32.mat").exists() for c in (d, d / "svhn")):
            missing.append(f"{d}/[svhn/]{split}_32x32.mat")
    return (not missing), missing


def _provision_svhn(d: Path):
    for split in ("train", "test"):
        _download(
            f"http://ufldl.stanford.edu/housenumbers/{split}_32x32.mat",
            d / "svhn" / f"{split}_32x32.mat")


def _verify_hf(name):
    def check(d: Path):
        from outgridvit_tpu.data.datasets import _load_hf_dataset

        try:
            ds = _load_hf_dataset(name, str(d))
            return True, [f"splits={sorted(ds.keys())}"]
        except Exception as e:
            return False, [f"HF dataset '{name}' not cached under {d}: {e}"]

    return check


def _verify_cifar100c(d: Path):
    for cand in (d / "CIFAR-100-C", d):
        ok, _ = _check_tree(cand, ["labels.npy"])
        if ok:
            return True, [str(cand)]
    return False, [f"{d}/CIFAR-100-C/{{<corruption>.npy, labels.npy}}"]


def _provision_cifar100c(d: Path):
    tar = _download(
        "https://zenodo.org/records/3555552/files/CIFAR-100-C.tar?download=1",
        d / "CIFAR-100-C.tar")
    _extract_tar(tar, d)


def _verify_tinyc(d: Path):
    from outgridvit_tpu.data.corruptions import _find_tinyc_dir

    try:
        base = _find_tinyc_dir(str(d))
        return True, [str(base)]
    except FileNotFoundError:
        return False, [f"{d}/Tiny-ImageNet-C/<corruption>/<severity>/<wnid>/*.JPEG"]


def _provision_tinyc(d: Path):
    # same Zenodo tar as the reference (`load_tinyimagenet_C.py:17`)
    tar = _download(
        "https://zenodo.org/records/8206060/files/Tiny-ImageNet-C.tar?download=1",
        d / "Tiny-ImageNet-C.tar")
    _extract_tar(tar, d)


def _verify_pets(d: Path):
    for cand in (d, d / "oxford-iiit-pet"):
        ok, _ = _check_tree(
            cand, ["annotations/trainval.txt", "annotations/test.txt", "images"])
        if ok:
            return True, [str(cand)]
    return False, [f"{d}/oxford-iiit-pet/{{images/, annotations/trainval.txt, "
                   f"annotations/test.txt}}"]


def _provision_pets(d: Path):
    base = d / "oxford-iiit-pet"
    for name in ("images", "annotations"):
        tar = _download(
            f"https://www.robots.ox.ac.uk/~vgg/data/pets/data/{name}.tar.gz",
            base / f"{name}.tar.gz")
        _extract_tar(tar, base)


DATASETS = {
    "cifar100": {
        "expected": "cifar-100-python/{train,test} (standard tar.gz pickles)",
        "verify": _verify_cifar100,
        "provision": _provision_cifar100,
    },
    "svhn": {
        "expected": "[svhn/]{train,test}_32x32.mat (cropped-digits format)",
        "verify": _verify_svhn,
        "provision": _provision_svhn,
    },
    "tinyimagenet": {
        "expected": "tiny-imagenet/ save_to_disk dir OR HF cache of "
                    "zh-plus/tiny-imagenet",
        "verify": _verify_hf("zh-plus/tiny-imagenet"),
        "provision": lambda d: _save_hf("zh-plus/tiny-imagenet", d),
    },
    "food101": {
        "expected": "food101/ save_to_disk dir OR HF cache of food101",
        "verify": _verify_hf("food101"),
        "provision": lambda d: _save_hf("food101", d),
    },
    "cifar100_c": {
        "expected": "CIFAR-100-C/{<corruption>.npy, labels.npy} (Zenodo tar)",
        "verify": _verify_cifar100c,
        "provision": _provision_cifar100c,
    },
    "tinyimagenet_c": {
        "expected": "Tiny-ImageNet-C/<corruption>/<severity>/<wnid>/*.JPEG "
                    "(Zenodo tar, same as reference)",
        "verify": _verify_tinyc,
        "provision": _provision_tinyc,
    },
    "oxford_pets": {
        "expected": "oxford-iiit-pet/{images/, annotations/{trainval,test}.txt}",
        "verify": _verify_pets,
        "provision": _provision_pets,
    },
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default="./data")
    ap.add_argument("--datasets", nargs="+", default=sorted(DATASETS),
                    choices=sorted(DATASETS))
    ap.add_argument("--verify-only", action="store_true",
                    help="check layouts; never touch the network")
    args = ap.parse_args()

    d = Path(args.data_dir)
    d.mkdir(parents=True, exist_ok=True)
    n_ok = 0
    failures = []
    for name in args.datasets:
        spec = DATASETS[name]
        ok, details = spec["verify"](d)
        if ok:
            print(f"[ok]      {name}: {details[0]}")
            n_ok += 1
            continue
        if args.verify_only:
            print(f"[missing] {name}: expected {spec['expected']}")
            failures.append(name)
            continue
        print(f"[fetch]   {name} ...")
        try:
            spec["provision"](d)
        except Exception as e:
            print(f"[fail]    {name}: {e}")
            failures.append(name)
            continue
        ok, details = spec["verify"](d)
        if ok:
            print(f"[ok]      {name}: {details[0]}")
            n_ok += 1
        else:
            print(f"[fail]    {name}: still missing {details}")
            failures.append(name)

    print(f"\n{n_ok}/{len(args.datasets)} datasets ready under {d}")
    if failures:
        print(f"missing: {', '.join(failures)} "
              f"(no egress? stage files per the 'expected' trees above)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
