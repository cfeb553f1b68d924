"""Data pipeline tests: loader determinism, transform correctness."""

import numpy as np
import pytest

from outgridvit_tpu.data.pipeline import ArrayDataLoader
from outgridvit_tpu.data.transforms import (
    EvalTransform,
    TrainTransform,
    normalize,
    rand_augment,
    random_crop,
    random_erasing,
    random_hflip,
)


def test_loader_shapes_and_determinism():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(20, 8, 8, 3), dtype=np.uint8)
    labels = np.arange(20) % 4
    tf = EvalTransform(8, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    loader = ArrayDataLoader(images, labels, batch_size=8, shuffle=True,
                             transform=tf, seed=3, num_threads=2)
    assert len(loader) == 3
    loader.set_epoch(1)
    b1 = [b for b in loader]
    loader.set_epoch(1)
    b2 = [b for b in loader]
    for (x1, y1), (x2, y2) in zip(b1, b2):
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)
    assert b1[0][0].shape == (8, 8, 8, 3)
    assert b1[0][0].dtype == np.float32

    # different epoch -> different order
    loader.set_epoch(2)
    b3 = [b for b in loader]
    assert any((y1 != y3).any() for (_, y1), (_, y3) in zip(b1, b3))


def test_loader_drop_last():
    images = np.zeros((10, 4, 4, 3), np.uint8)
    labels = np.zeros(10, np.int64)
    assert len(ArrayDataLoader(images, labels, 4, drop_last=True)) == 2
    assert len(ArrayDataLoader(images, labels, 4, drop_last=False)) == 3


def test_normalize_matches_torch_semantics():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    mean, std = (0.5, 0.4, 0.3), (0.2, 0.3, 0.4)
    x = normalize(img, mean, std)
    want = (img.astype(np.float32) / 255.0 - np.array(mean, np.float32)) / np.array(
        std, np.float32)
    np.testing.assert_allclose(x, want, rtol=1e-6)


def test_random_crop_pads_and_preserves_shape():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    out = random_crop(img, rng, padding=4)
    assert out.shape == img.shape


def test_random_hflip():
    rng = np.random.default_rng(1)
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    outs = {random_hflip(img, np.random.default_rng(s)).tobytes()
            for s in range(10)}
    assert img.tobytes() in outs and img[:, ::-1].tobytes() in outs


def test_rand_augment_valid_output():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    for seed in range(8):
        out = rand_augment(img, np.random.default_rng(seed), num_ops=2,
                           magnitude=7)
        assert out.shape == img.shape and out.dtype == np.uint8


def test_random_erasing_applies_with_p1():
    rng = np.random.default_rng(3)
    img = np.zeros((16, 16, 3), np.float32)
    out = random_erasing(img, rng, p=1.0)
    assert (out != 0).any()
    out2 = random_erasing(img, np.random.default_rng(4), p=0.0)
    assert (out2 == 0).all()


def test_train_transform_full_recipe():
    tf = TrainTransform(img_size=32, native_size=32,
                        mean=(0.5,) * 3, std=(0.25,) * 3,
                        ra_num_ops=2, ra_magnitude=7, random_erasing_p=0.5)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    x = tf(img, np.random.default_rng(1))
    assert x.shape == (32, 32, 3) and x.dtype == np.float32
    # resize path
    tf64 = TrainTransform(img_size=64, native_size=32,
                          mean=(0.5,) * 3, std=(0.25,) * 3)
    x64 = tf64(img, np.random.default_rng(1))
    assert x64.shape == (64, 64, 3)


def test_synthetic_loader():
    from outgridvit_tpu.data.datasets import get_synthetic_dataloaders

    tr, va, te = get_synthetic_dataloaders(batch_size=16, num_samples=64,
                                           img_size=8, num_classes=5, seed=0)
    assert va is None and te is None
    x, y = next(iter(tr))
    assert x.shape == (16, 8, 8, 3)
    assert ((0 <= y) & (y < 5)).all()


def test_registry_rejects_unknown():
    from outgridvit_tpu.data import build_dataloaders

    with pytest.raises(ValueError):
        build_dataloaders({"dataset": "mnist"}, 10)


def test_prepare_data_verify_registry(tmp_path):
    """scripts/prepare_data.py --verify-only detects staged vs missing trees
    (the provisioning hook for the reference's implicit downloads,
    `load_tinyimagenet_C.py:109-131`)."""
    import pickle
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1] / "scripts"))
    import prepare_data

    assert set(prepare_data.DATASETS) == {
        "cifar100", "svhn", "tinyimagenet", "food101", "cifar100_c",
        "tinyimagenet_c", "oxford_pets"}
    ok, _ = prepare_data.DATASETS["cifar100"]["verify"](tmp_path)
    assert not ok
    base = tmp_path / "cifar-100-python"
    base.mkdir()
    for split in ("train", "test"):
        with open(base / split, "wb") as f:
            pickle.dump({b"data": np.zeros((2, 3072), np.uint8),
                         b"fine_labels": [0, 1]}, f)
    ok, detail = prepare_data.DATASETS["cifar100"]["verify"](tmp_path)
    assert ok and str(base) in detail[0]


def _fake_hf_image_dataset(n_train, n_test, num_classes, size=12, seed=0,
                           test_split_name="validation"):
    import datasets as hf_datasets
    from PIL import Image

    rng = np.random.default_rng(seed)

    def split(n):
        imgs = [Image.fromarray(
            rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
            for _ in range(n)]
        labels = (np.arange(n) % num_classes).tolist()
        return hf_datasets.Dataset.from_dict(
            {"image": imgs, "label": labels},
            features=hf_datasets.Features(
                {"image": hf_datasets.Image(),
                 "label": hf_datasets.ClassLabel(
                     names=[f"c{i}" for i in range(num_classes)])}),
        )

    return hf_datasets.DatasetDict(
        {"train": split(n_train), test_split_name: split(n_test)})


def test_food101_loader_from_disk_fixture(tmp_path):
    """Food-101 loader via the offline `save_to_disk` path: no-aug recipe
    (reference `load_food101.py:85-90`), resize to img_size, float32 NHWC."""
    from outgridvit_tpu.data.datasets import get_food101_dataloaders

    ds = _fake_hf_image_dataset(12, 8, num_classes=4, size=12)
    ds.save_to_disk(str(tmp_path / "food101"))

    tr, va, te = get_food101_dataloaders(
        batch_size=4, data_dir=str(tmp_path), img_size=16, num_workers=1,
        val_split=0.25)
    xb, yb = next(iter(tr))
    assert xb.shape == (4, 16, 16, 3) and xb.dtype == np.float32
    assert ((0 <= yb) & (yb < 4)).all()
    assert sum(len(y) for _, y in va) == 3  # 25% of 12
    assert sum(len(y) for _, y in te) == 8
    # no-augs: the same index must produce identical pixels across epochs
    tr.set_epoch(1)
    a = np.sort(np.concatenate([x.reshape(len(x), -1).sum(1) for x, _ in tr]))
    tr.set_epoch(2)
    b = np.sort(np.concatenate([x.reshape(len(x), -1).sum(1) for x, _ in tr]))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_oxfordpets_loader_directory_fixture(tmp_path):
    """Oxford-IIIT Pets loader on the official directory layout
    (reference `load_oxfordpets.py:33-54`): images/ + annotations txts,
    1-indexed class ids, official splits, no augmentation."""
    from PIL import Image

    from outgridvit_tpu.data.datasets import get_oxfordpets_dataloaders

    base = tmp_path / "oxford-iiit-pet"
    (base / "images").mkdir(parents=True)
    (base / "annotations").mkdir()
    rng = np.random.default_rng(0)
    trainval, test = [], []
    for i in range(10):
        stem = f"Breed_{i}"
        Image.fromarray(
            rng.integers(0, 255, (20, 24, 3), dtype=np.uint8)
        ).save(base / "images" / f"{stem}.jpg")
        # annotation format: <stem> <class_id 1..K> <species> <breed_id>
        line = f"{stem} {i % 3 + 1} 1 1"
        (trainval if i < 6 else test).append(line)
    # a listed-but-missing image must be skipped, not crash
    trainval.append("Missing_Image 1 1 1")
    (base / "annotations" / "trainval.txt").write_text("\n".join(trainval))
    (base / "annotations" / "test.txt").write_text("\n".join(test))

    tr, va, te = get_oxfordpets_dataloaders(
        batch_size=3, data_dir=str(tmp_path), img_size=16, num_workers=1)
    assert va is None
    xb, yb = next(iter(tr))
    assert xb.shape == (3, 16, 16, 3) and xb.dtype == np.float32
    assert ((0 <= yb) & (yb < 3)).all()  # labels shifted to 0-based
    assert sum(len(y) for _, y in tr) == 6  # missing image skipped
    assert sum(len(y) for _, y in te) == 4

    with pytest.raises(FileNotFoundError):
        get_oxfordpets_dataloaders(data_dir=str(tmp_path / "nope"))


def test_synthetic_structured_loaders():
    """Learnable-synthetic dataset: correct shapes/dtypes, device-augment
    markers, and class signal (same-class samples closer than cross-class)."""
    import numpy as np

    from outgridvit_tpu.data.datasets import (
        get_synthetic_structured_dataloaders,
    )

    tr, va, te = get_synthetic_structured_dataloaders(
        batch_size=32, num_samples=256, img_size=32, num_classes=10,
        seed=0, val_split=0.25, noise=30.0)
    xb, yb = next(iter(tr))
    assert xb.shape == (32, 32, 32, 3) and xb.dtype == np.uint8
    assert tr.device_augment is not None
    assert va.device_normalize is not None and te.device_normalize is not None

    # class signal: mean same-class distance < mean cross-class distance
    xs, ys = next(iter(te))
    xf = xs.astype(np.float32).reshape(len(xs), -1)
    d = np.linalg.norm(xf[:, None] - xf[None, :], axis=-1)
    same = ys[:, None] == ys[None, :]
    off = ~np.eye(len(xs), dtype=bool)
    assert d[same & off].mean() < d[~same].mean()


def test_peek_loader_one_shot_and_reiterable():
    """peek_loader (data/pipeline.py) must not drop the peeked batch for
    one-shot iterator loaders, and must hand back the loader itself when it
    is re-iterable — the same contract train_model honors
    (test_one_shot_iterator_loader_trains_all_batches) extended to every
    entry point's shape probe (scripts/benchmark_eval.py,
    scripts/run_attention_analysis.py, scripts/ab_eval_k.py)."""
    import numpy as np

    from outgridvit_tpu.data.pipeline import ArrayDataLoader, peek_loader

    batches = [(np.full((2, 4, 4, 3), i, np.float32), np.array([i, i]))
               for i in range(3)]

    class OneShot:
        def __init__(self):
            self._it = iter(batches)

        def __iter__(self):
            return self._it

    first, it = peek_loader(OneShot())
    assert first[1][0] == 0
    seen = [int(y[0]) for _, y in it]
    assert seen == [0, 1, 2]  # peeked batch re-queued, nothing lost

    imgs = np.zeros((6, 4, 4, 3), np.uint8)
    labels = np.arange(6)
    loader = ArrayDataLoader(imgs, labels, batch_size=2, num_threads=1)
    first, it2 = peek_loader(loader)
    assert it2 is loader  # re-iterable: caller iterates the loader fresh
    assert sum(len(y) for _, y in it2) == 6
