"""Dataset loaders: CIFAR-100, SVHN, Tiny-ImageNet-200, Food-101,
Oxford-IIIT Pets, synthetic.

Each ``get_*_dataloaders`` mirrors the reference loader contract
(`src/data/load_cifrar100.py:99-161` et al.): returns
``(train_loader, val_loader_or_None, test_loader)`` with the shared recipe
(resize-if-needed, RandomCrop(pad=max(4, img/8)), flip, RandAugment,
normalize, RandomErasing) and a seed-stable train/val split. Batches are
NHWC float32 (normalized) + int32 labels.

All loaders are offline-first: they read standard on-disk formats from
``data_dir`` (CIFAR python pickles, SVHN .mat, Tiny-ImageNet HF cache or
directory tree) and raise a clear error naming the expected layout when the
files are absent (this environment has no network egress).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from outgridvit_tpu.data.pipeline import ArrayDataLoader
from outgridvit_tpu.data.transforms import EvalTransform, TrainTransform

CIFAR100_MEAN = (0.5071, 0.4867, 0.4408)
CIFAR100_STD = (0.2675, 0.2565, 0.2761)
SVHN_MEAN = (0.4377, 0.4438, 0.4728)
SVHN_STD = (0.1980, 0.2010, 0.1970)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _split_train_val(
    n: int, val_split: float, seed: int
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Seed-stable random train/val split (reference uses seeded
    ``random_split``, `load_cifrar100.py:77-87`)."""
    if val_split <= 0.0:
        return np.arange(n), None
    n_val = int(n * val_split)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    return perm[n_val:], perm[:n_val]


def _make_loaders(
    train_images,
    train_labels,
    test_images,
    test_labels,
    *,
    native_size: int,
    mean,
    std,
    batch_size: int,
    val_split: float,
    seed: int,
    img_size: int,
    ra_num_ops: int = 2,
    ra_magnitude: int = 7,
    random_erasing_p: float = 0.25,
    crop_pad: Optional[int] = None,
    num_threads: int = 8,
    drop_last: bool = False,
    enable_augs: bool = True,
    device_augment: bool = False,
):
    pad = crop_pad if crop_pad is not None else max(4, img_size // 8)
    if device_augment:
        # host only resizes; the recipe runs in-jit (ops/augment.py) and its
        # parameters travel on the loader for the trainer to pick up
        from outgridvit_tpu.data.transforms import RawTransform
        from outgridvit_tpu.ops.augment import AugmentConfig

        train_tf = RawTransform(img_size)
        aug_cfg = AugmentConfig(
            mean=tuple(mean), std=tuple(std), crop_pad=pad,
            ra_num_ops=ra_num_ops, ra_magnitude=ra_magnitude,
            random_erasing_p=random_erasing_p, enable_augs=enable_augs,
        )
    else:
        train_tf = TrainTransform(
            img_size, native_size, mean, std, ra_num_ops, ra_magnitude,
            random_erasing_p, crop_pad=crop_pad, enable_augs=enable_augs,
        )
        aug_cfg = None
    if device_augment:
        # eval batches also travel uint8 (4x less host->device traffic) and
        # normalize inside the jitted eval step (ops/augment.py)
        eval_tf = RawTransform(img_size)
        norm_cfg = (tuple(mean), tuple(std))
    else:
        eval_tf = EvalTransform(img_size, mean, std)
        norm_cfg = None

    tr_idx, va_idx = _split_train_val(len(train_labels), val_split, seed)
    train_loader = ArrayDataLoader(
        train_images[tr_idx] if isinstance(train_images, np.ndarray)
        else _Subset(train_images, tr_idx),
        np.asarray(train_labels)[tr_idx],
        batch_size=batch_size, shuffle=True, transform=train_tf, seed=seed,
        drop_last=drop_last, num_threads=num_threads,
    )
    train_loader.device_augment = aug_cfg
    val_loader = None
    if va_idx is not None:
        val_loader = ArrayDataLoader(
            train_images[va_idx] if isinstance(train_images, np.ndarray)
            else _Subset(train_images, va_idx),
            np.asarray(train_labels)[va_idx],
            batch_size=batch_size, shuffle=False, transform=eval_tf, seed=seed,
            num_threads=num_threads,
        )
        val_loader.device_normalize = norm_cfg
    test_loader = ArrayDataLoader(
        test_images, np.asarray(test_labels),
        batch_size=batch_size, shuffle=False, transform=eval_tf, seed=seed,
        num_threads=num_threads,
    )
    test_loader.device_normalize = norm_cfg
    return train_loader, val_loader, test_loader


class _Subset:
    def __init__(self, base, idxs):
        self.base = base
        self.idxs = np.asarray(idxs)

    def __getitem__(self, i):
        return self.base[int(self.idxs[i])]

    def __len__(self):
        return len(self.idxs)


# ----------------------------------------------------------------- CIFAR-100

def _load_cifar100_raw(data_dir: str):
    root = Path(data_dir)
    base = None
    for cand in (root / "cifar-100-python", root):
        if (cand / "train").exists() and (cand / "test").exists():
            base = cand
            break
    if base is None:
        raise FileNotFoundError(
            f"CIFAR-100 python pickles not found under {data_dir}. Expected "
            f"{data_dir}/cifar-100-python/{{train,test}} (standard "
            f"cifar-100-python.tar.gz layout); no network egress to download."
        )

    def load(split):
        with open(base / split, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        imgs = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        labels = np.asarray(d[b"fine_labels"], dtype=np.int64)
        return np.ascontiguousarray(imgs), labels

    return load("train"), load("test")


def get_cifar100_dataloaders(
    batch_size: int = 128,
    data_dir: str = "./data",
    num_workers: int = 8,
    val_split: float = 0.0,
    pin_memory: bool = True,  # accepted for config compatibility; unused
    ra_num_ops: int = 2,
    ra_magnitude: int = 7,
    random_erasing_p: float = 0.25,
    img_size: int = 32,
    seed: int = 7,
    device_augment: bool = False,
):
    if img_size < 32:
        raise ValueError("img_size must be >= 32 for CIFAR-100")
    (xtr, ytr), (xte, yte) = _load_cifar100_raw(data_dir)
    return _make_loaders(
        xtr, ytr, xte, yte, native_size=32, mean=CIFAR100_MEAN,
        std=CIFAR100_STD, batch_size=batch_size, val_split=val_split,
        seed=seed, img_size=img_size, ra_num_ops=ra_num_ops,
        ra_magnitude=ra_magnitude, random_erasing_p=random_erasing_p,
        num_threads=max(1, num_workers), device_augment=device_augment,
    )


# ----------------------------------------------------------------- SVHN

def _load_svhn_raw(data_dir: str):
    import scipy.io

    root = Path(data_dir)

    def load(split):
        path = None
        for cand in (root / f"{split}_32x32.mat", root / "svhn" / f"{split}_32x32.mat"):
            if cand.exists():
                path = cand
                break
        if path is None:
            raise FileNotFoundError(
                f"SVHN {split}_32x32.mat not found under {data_dir}; "
                f"no network egress to download."
            )
        d = scipy.io.loadmat(str(path))
        imgs = np.ascontiguousarray(d["X"].transpose(3, 0, 1, 2))
        labels = d["y"].reshape(-1).astype(np.int64)
        labels[labels == 10] = 0  # reference SVHNLabelFix (`load_svhn.py:22-38`)
        return imgs, labels

    return load("train"), load("test")


def get_svhn_dataloaders(
    batch_size: int = 128,
    data_dir: str = "./data",
    num_workers: int = 8,
    val_split: float = 0.0,
    pin_memory: bool = True,
    ra_num_ops: int = 2,
    ra_magnitude: int = 7,
    random_erasing_p: float = 0.25,
    img_size: int = 32,
    seed: int = 7,
    device_augment: bool = False,
):
    (xtr, ytr), (xte, yte) = _load_svhn_raw(data_dir)
    return _make_loaders(
        xtr, ytr, xte, yte, native_size=32, mean=SVHN_MEAN, std=SVHN_STD,
        batch_size=batch_size, val_split=val_split, seed=seed,
        img_size=img_size, ra_num_ops=ra_num_ops, ra_magnitude=ra_magnitude,
        random_erasing_p=random_erasing_p, num_threads=max(1, num_workers),
        device_augment=device_augment,
    )


# ------------------------------------------------------- Tiny-ImageNet-200

def _load_hf_dataset(hf_name: str, data_dir: str):
    """Load a HuggingFace dataset offline-first: a ``save_to_disk`` directory
    under ``data_dir`` (named after the dataset, or ``data_dir`` itself) wins
    over the hub cache — this machine has no network egress, so provisioning
    drops a `DatasetDict.save_to_disk` tree (see scripts/prepare_data.py)."""
    import datasets as hf_datasets

    root = Path(data_dir)
    for cand in (root / hf_name.replace("/", "___"),
                 root / hf_name.split("/")[-1], root):
        if (cand / "dataset_dict.json").exists():
            return hf_datasets.load_from_disk(str(cand))
    return hf_datasets.load_dataset(hf_name, cache_dir=str(data_dir))


class _HFImageView:
    """Lazy uint8 view over a HuggingFace image dataset split."""

    def __init__(self, split, image_key="image"):
        self.split = split
        self.image_key = image_key

    def __getitem__(self, i):
        img = self.split[int(i)][self.image_key]
        arr = np.asarray(img.convert("RGB"))
        return arr

    def __len__(self):
        return len(self.split)


def get_tinyimagenet200_hf_dataloaders(
    batch_size: int = 128,
    data_dir: str = "./data",
    hf_name: str = "zh-plus/tiny-imagenet",
    num_workers: int = 8,
    val_split: float = 0.0,
    pin_memory: bool = True,
    ra_num_ops: int = 2,
    ra_magnitude: int = 7,
    random_erasing_p: float = 0.25,
    img_size: int = 64,
    drop_last: bool = True,
    seed: int = 7,
    enable_augs: bool = True,
    device_augment: bool = False,
):
    """Tiny-ImageNet-200 via a local HF datasets cache (reference
    `src/data/load_tinyimagenet.py:69-160`). val_split > 0 carves val from
    train and the HF 'valid' split becomes the test set."""
    try:
        ds = _load_hf_dataset(hf_name, data_dir)
    except Exception as e:  # offline & uncached
        raise FileNotFoundError(
            f"Tiny-ImageNet HF dataset '{hf_name}' unavailable offline "
            f"(cache_dir={data_dir}): {e}"
        ) from e

    train_split = ds["train"]
    test_split = ds["valid"] if "valid" in ds else ds["validation"]

    ytr = np.asarray(train_split["label"], dtype=np.int64)
    yte = np.asarray(test_split["label"], dtype=np.int64)

    crop_pad = max(8, img_size // 8)  # reference `load_tinyimagenet.py:103`
    return _make_loaders(
        _HFImageView(train_split), ytr, _HFImageView(test_split), yte,
        native_size=64, mean=IMAGENET_MEAN, std=IMAGENET_STD,
        batch_size=batch_size, val_split=val_split, seed=seed,
        img_size=img_size, ra_num_ops=ra_num_ops, ra_magnitude=ra_magnitude,
        random_erasing_p=random_erasing_p, crop_pad=crop_pad,
        num_threads=max(1, num_workers), drop_last=drop_last,
        enable_augs=enable_augs, device_augment=device_augment,
    )


# ----------------------------------------------------------------- synthetic

def synth_structured_arrays(
    num_samples: int,
    img_size: int = 32,
    num_classes: int = 100,
    seed: int = 7,
    noise: float = 80.0,
    proto_seed: int = 7,
):
    """Raw uint8 draws from the learnable structured generator (same recipe
    as ``get_synthetic_structured_dataloaders``). Exposed separately so
    cross-framework harnesses (``scripts/epoch_parity.py``) can feed the
    IDENTICAL dataset to this framework and to the PyTorch reference.
    ``proto_seed`` fixes the class prototypes while ``seed`` varies the
    sample draw, so disjoint train/val splits share the generative process.
    The prototype stream is derived from ``(proto_seed, "protos")`` so that
    ``proto_seed == seed`` (the common case) does NOT replay the identical
    bit stream for prototypes and sample noise."""
    proto_rng = np.random.default_rng(
        np.random.SeedSequence((proto_seed, 0x70726F74)))  # "prot"
    small = proto_rng.uniform(40, 215, (num_classes, 8, 8, 3))
    reps = img_size // 8 + (img_size % 8 > 0)
    protos = np.kron(small, np.ones((1, reps, reps, 1)))[:, :img_size,
                                                         :img_size]
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, size=(num_samples,)).astype(np.int64)
    x = protos[y]
    x = x + rng.normal(0.0, noise, x.shape)
    x = x + rng.uniform(-25, 25, (num_samples, 1, 1, 1))
    shift = rng.integers(-4, 5, size=(num_samples, 2))
    x = np.stack([np.roll(im, tuple(s), axis=(0, 1))
                  for im, s in zip(x, shift)])
    return np.clip(x, 0, 255).astype(np.uint8), y


def get_synthetic_structured_dataloaders(
    batch_size: int = 128,
    num_samples: int = 51200,
    img_size: int = 32,
    num_classes: int = 100,
    seed: int = 7,
    val_split: float = 0.1,
    noise: float = 80.0,
    device_augment: bool = True,
    **_,
):
    """LEARNABLE synthetic dataset: accuracy-dynamics evidence without real
    data (docs/PARITY.md "accuracy evidence").

    Each class is a fixed random low-frequency prototype image; every sample
    is its class prototype under heavy pixel noise, a random brightness
    shift, and a random roll. Train/val/test are DISJOINT DRAWS from the
    same generative process, so val/test accuracy measures generalization
    (prototype learning through the full recipe — device RandAugment,
    mixup/cutmix, schedule — not memorization). Goes through the standard
    ``_make_loaders`` path like every real dataset.
    """
    rng = np.random.default_rng(seed)
    # low-frequency prototypes: upsampled 8x8 noise, strong class signal
    small = rng.uniform(40, 215, (num_classes, 8, 8, 3))
    reps = img_size // 8 + (img_size % 8 > 0)
    protos = np.kron(small, np.ones((1, reps, reps, 1)))[:, :img_size,
                                                         :img_size]

    def draw(n, r):
        y = r.integers(0, num_classes, size=(n,)).astype(np.int64)
        x = protos[y]
        x = x + r.normal(0.0, noise, x.shape)
        x = x + r.uniform(-25, 25, (n, 1, 1, 1))
        shift = r.integers(-4, 5, size=(n, 2))
        x = np.stack([np.roll(im, tuple(s), axis=(0, 1))
                      for im, s in zip(x, shift)])
        return np.clip(x, 0, 255).astype(np.uint8), y

    xtr, ytr = draw(num_samples, rng)
    xte, yte = draw(max(1000, num_samples // 10),
                    np.random.default_rng(seed + 1))
    return _make_loaders(
        xtr, ytr, xte, yte, native_size=img_size,
        mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25),
        batch_size=batch_size, val_split=val_split, seed=seed,
        img_size=img_size, device_augment=device_augment,
    )


def get_synthetic_dataloaders(
    batch_size: int = 64,
    num_samples: int = 256,
    img_size: int = 32,
    num_classes: int = 100,
    seed: int = 7,
    device_augment: bool = False,
):
    """Random-tensor dataset for smoke/CPU runs (reference
    `scripts/train.py:117-130`). With ``device_augment`` the images are raw
    uint8 and the loader carries an AugmentConfig, exercising the in-jit
    recipe end-to-end without real data."""
    rng = np.random.default_rng(seed)
    if device_augment:
        images = rng.integers(0, 255, (num_samples, img_size, img_size, 3),
                              dtype=np.uint8)
    else:
        images = rng.standard_normal(
            (num_samples, img_size, img_size, 3)).astype(np.float32)
    labels = rng.integers(0, num_classes, size=(num_samples,)).astype(np.int64)
    loader = ArrayDataLoader(
        images, labels, batch_size=batch_size, shuffle=True, transform=None,
        seed=seed, num_threads=1,
    )
    if device_augment:
        from outgridvit_tpu.ops.augment import AugmentConfig

        loader.device_augment = AugmentConfig(
            mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25),
            crop_pad=max(4, img_size // 8),
        )
        loader.device_normalize = ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    return loader, None, None


# ------------------------------------------------------ Food-101 (no augs)

def get_food101_dataloaders(
    batch_size: int = 128,
    data_dir: str = "./data",
    hf_name: str = "food101",
    num_workers: int = 8,
    val_split: float = 0.0,
    img_size: int = 64,
    seed: int = 7,
    **_,
):
    """Food-101 via a local HF cache; plain Resize/Normalize only — the
    reference uses no augmentation here (`src/data/load_food101.py:85-90`)."""
    try:
        ds = _load_hf_dataset(hf_name, data_dir)
    except Exception as e:
        raise FileNotFoundError(
            f"Food-101 HF dataset unavailable offline (cache_dir={data_dir}): {e}"
        ) from e
    train_split = ds["train"]
    test_split = ds["validation"] if "validation" in ds else ds["test"]
    ytr = np.asarray(train_split["label"], dtype=np.int64)
    yte = np.asarray(test_split["label"], dtype=np.int64)
    return _make_loaders(
        _HFImageView(train_split), ytr, _HFImageView(test_split), yte,
        native_size=img_size, mean=IMAGENET_MEAN, std=IMAGENET_STD,
        batch_size=batch_size, val_split=val_split, seed=seed,
        img_size=img_size, num_threads=max(1, num_workers),
        enable_augs=False,
    )


# ------------------------------------------- Oxford-IIIT Pets (no augs)

def get_oxfordpets_dataloaders(
    batch_size: int = 128,
    data_dir: str = "./data",
    num_workers: int = 8,
    val_split: float = 0.0,
    img_size: int = 64,
    seed: int = 7,
    **_,
):
    """Oxford-IIIT Pets from the official directory layout
    (``images/`` + ``annotations/{trainval,test}.txt``), official splits,
    no augmentation (reference `src/data/load_oxfordpets.py:33-54`)."""
    root = Path(data_dir)
    base = None
    for cand in (root, root / "oxford-iiit-pet"):
        if (cand / "annotations" / "trainval.txt").exists():
            base = cand
            break
    if base is None:
        raise FileNotFoundError(
            f"Oxford-IIIT Pets not found under {data_dir}. Expected "
            f"{data_dir}/oxford-iiit-pet/{{images/, annotations/trainval.txt, "
            f"annotations/test.txt}}; no network egress to download."
        )

    def load_split(name):
        paths, labels = [], []
        for line in (base / "annotations" / f"{name}.txt").read_text().splitlines():
            if not line.strip():
                continue
            stem, class_id = line.split()[0], int(line.split()[1])
            img = base / "images" / f"{stem}.jpg"
            if img.exists():
                paths.append(img)
                labels.append(class_id - 1)
        return paths, np.asarray(labels, dtype=np.int64)

    from outgridvit_tpu.data.corruptions import _ImageFileView

    tr_paths, ytr = load_split("trainval")
    te_paths, yte = load_split("test")
    return _make_loaders(
        _ImageFileView(tr_paths), ytr, _ImageFileView(te_paths), yte,
        native_size=img_size, mean=IMAGENET_MEAN, std=IMAGENET_STD,
        batch_size=batch_size, val_split=val_split, seed=seed,
        img_size=img_size, num_threads=max(1, num_workers),
        enable_augs=False,
    )


def tinyimagenet_wnid_to_label(
    data_dir: str = "./data", hf_name: str = "zh-plus/tiny-imagenet"
) -> dict:
    """wnid -> clean label index map, needed by the Tiny-ImageNet-C
    intersection loaders (reference `load_tinyimagenet.py:29-64` exposes
    class_names from the HF ClassLabel feature)."""
    ds = _load_hf_dataset(hf_name, data_dir)
    names = ds["train"].features["label"].names
    return {wnid: i for i, wnid in enumerate(names)}
