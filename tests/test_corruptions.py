"""Corruption-suite tests with synthesized on-disk fixtures."""

import numpy as np
import pytest

from outgridvit_tpu.data.corruptions import (
    evaluate_cifar100c_suite,
    evaluate_tinyc_suite,
    get_cifar100c_loader,
    get_tinyimagenet200c_loader_intersection,
    list_tinyc_corruptions,
    summarize_corruption_results,
)


@pytest.fixture(scope="module")
def fake_c100c(tmp_path_factory):
    # module-scoped and tiled: generating 2x153MB of fresh random bytes per
    # test was ~45s of the suite; the consumers only need the on-disk shape
    # and the labels, not 50k unique images
    tmp_path = tmp_path_factory.mktemp("c100c")
    base = tmp_path / "CIFAR-100-C"
    base.mkdir()
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 100, size=50000).astype(np.int64)
    np.save(base / "labels.npy", labels)
    block = rng.integers(0, 255, size=(1000, 32, 32, 3), dtype=np.uint8)
    for name in ("gaussian_noise", "fog"):
        np.save(base / f"{name}.npy", np.tile(block, (50, 1, 1, 1)))
    return tmp_path


def test_cifar100c_loader_severity_slicing(fake_c100c):
    loader = get_cifar100c_loader("fog", 3, str(fake_c100c), batch_size=500)
    assert len(loader) == 20
    x, y = next(iter(loader))
    assert x.shape == (500, 32, 32, 3)
    with pytest.raises(ValueError):
        get_cifar100c_loader("fog", 6, str(fake_c100c))
    with pytest.raises(FileNotFoundError):
        get_cifar100c_loader("nonexistent", 1, str(fake_c100c))


def test_cifar100c_suite_and_summary(fake_c100c):
    def fake_eval(loader):
        return 1.0, {"top1": 50.0, "top5": 80.0}

    rows = evaluate_cifar100c_suite(
        fake_eval, str(fake_c100c), corruptions=["fog", "gaussian_noise"],
        severities=(1, 5), verbose=False)
    assert len(rows) == 4
    summary = summarize_corruption_results(rows)
    assert summary["overall_top1"] == pytest.approx(50.0)
    assert summary["by_severity"] == {1: 50.0, 5: 50.0}
    assert set(summary["by_corruption"]) == {"fog", "gaussian_noise"}


@pytest.fixture
def fake_tinyc(tmp_path):
    from PIL import Image

    base = tmp_path / "Tiny-ImageNet-C"
    rng = np.random.default_rng(0)
    for corr in ("fog",):
        for sev in (1, 3):
            for wnid in ("n001", "n002", "n999"):
                d = base / corr / str(sev) / wnid
                d.mkdir(parents=True)
                for i in range(3):
                    arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                    Image.fromarray(arr).save(d / f"{wnid}_{i}.JPEG")
    return tmp_path


def test_tinyc_intersection_and_remap(fake_tinyc):
    # clean set knows n001 and n002 only -> n999 must be dropped
    wnid_map = {"n001": 7, "n002": 42}
    loader, kept = get_tinyimagenet200c_loader_intersection(
        "fog", 1, str(fake_tinyc), wnid_map, batch_size=6)
    assert kept == ["n001", "n002"]
    xs, ys = [], []
    for x, y in loader:
        xs.append(x)
        ys.append(y)
    y = np.concatenate(ys)
    assert set(y.tolist()) == {7, 42}
    assert len(y) == 6  # 3 per kept class

    assert list_tinyc_corruptions(str(fake_tinyc)) == ["fog"]


def test_tinyc_suite(fake_tinyc):
    def fake_eval(loader):
        return 0.5, {"top1": 25.0, "top5": 60.0}

    rows = evaluate_tinyc_suite(
        fake_eval, {"n001": 0, "n002": 1}, str(fake_tinyc),
        corruptions=["fog"], severities=(1, 3), verbose=False)
    assert len(rows) == 2
    assert all(r["n_classes"] == 2 for r in rows)


def test_data_utils_describe_and_show(tmp_path):
    from outgridvit_tpu.data.datasets import get_synthetic_dataloaders
    from outgridvit_tpu.data.data_utils import describe_loader, show_batch

    loader, _, _ = get_synthetic_dataloaders(batch_size=8, num_samples=16,
                                             img_size=8, num_classes=4)
    info = describe_loader(loader, "synthetic")
    assert info["batch_shape"] == (8, 8, 8, 3)
    assert info["n_unique_labels"] <= 4
    out = tmp_path / "batch.png"
    show_batch(loader, mean=(0, 0, 0), std=(1, 1, 1), n=8, save_path=str(out))
    assert out.stat().st_size > 1000


def test_baseline_zoo_forward():
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.models.baselines import build_baseline

    x = jnp.zeros((2, 16, 16, 3))
    for name in ("resnet18_cifar", "vit_micro_patch4"):
        model = build_baseline(name, 10)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        logits = jax.jit(model.apply)(variables, x)
        assert logits.shape == (2, 10)
    with pytest.raises(ValueError):
        build_baseline("alexnet", 10)


def test_tiny_clean_intersection_loader(fake_tinyc):
    from outgridvit_tpu.data.corruptions import get_tiny_clean_intersection_loader

    rng = np.random.default_rng(0)
    clean_images = rng.integers(0, 255, (12, 64, 64, 3), dtype=np.uint8)
    # labels 0..3; wnid map says n001->0, n002->1 exist in the C set;
    # labels 2,3 belong to classes absent from the corruption set
    clean_labels = np.arange(12) % 4
    wnid_map = {"n001": 0, "n002": 1, "nXXX": 2, "nYYY": 3}
    loader, kept = get_tiny_clean_intersection_loader(
        clean_images, clean_labels, wnid_map, str(fake_tinyc), batch_size=4)
    assert kept == {0, 1}
    ys = np.concatenate([y for _, y in loader])
    assert set(ys.tolist()) == {0, 1}
    assert len(ys) == 6


def test_cifar100c_label_crosscheck(fake_c100c, tmp_path):
    import pickle

    from outgridvit_tpu.data.corruptions import crosscheck_cifar100c_labels

    # clean CIFAR pickles whose test labels equal the C severity-1 slice
    c_labels = np.load(fake_c100c / "CIFAR-100-C" / "labels.npy")
    base = tmp_path / "cifar-100-python"
    base.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for split, n, labels in (("train", 100, rng.integers(0, 100, 100)),
                             ("test", 10000, c_labels[:10000])):
        with open(base / split, "wb") as f:
            pickle.dump({b"data": rng.integers(0, 255, (n, 3072), dtype=np.uint8),
                         b"fine_labels": list(map(int, labels))}, f)
    assert crosscheck_cifar100c_labels(str(fake_c100c), str(tmp_path))


def test_window_partition_roundtrip_and_maxvit():
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.ops.grid import window_partition, window_unpartition

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6))
    wins, meta = window_partition(x, 4)
    assert wins.shape == (2 * 4, 4, 4, 6)
    # windows are CONTIGUOUS patches (not dilated like grid_partition)
    np.testing.assert_array_equal(np.asarray(wins[0]), np.asarray(x[0, :4, :4]))
    y = window_unpartition(wins, meta)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    from outgridvit_tpu.models.baselines import build_baseline

    model = build_baseline("maxvit_nano", 10)
    xin = jnp.zeros((2, 16, 16, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), xin)
    logits = jax.jit(model.apply)(variables, xin)
    assert logits.shape == (2, 10)


@pytest.mark.slow
def test_maxvit_tiny_baseline_forward():
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.models.baselines import build_baseline

    # scale down to smoke size: same 4-stage/every-stage-downsamples topology
    model = build_baseline("maxvit_tiny", 10)
    model = model.clone(dims=(8, 16, 16, 32), depths=(1, 1, 1, 1), stem_dim=8)
    x = jnp.zeros((2, 16, 16, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 10)
    assert bool(jnp.isfinite(logits).all())
    # stride-2 MBConv at the first block of EVERY stage: 16 -> 1 after 4 stages
    # (smoke-checks the timm maxvit_tiny_tf stage layout the reference uses)


def test_swin_baseline_forward_and_mask_semantics():
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.models.baselines import build_baseline

    model = build_baseline("swin_tiny", 10)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    fwd = jax.jit(model.apply)
    logits = fwd(variables, x)
    assert logits.shape == (2, 10)
    assert bool(jnp.isfinite(logits).all())

    # the shifted block must actually change behavior vs unshifted:
    # translate the input by the shift amount; a purely windowed model is
    # equivariant to window-aligned shifts, the shifted-window model is not
    # equivariant to half-window shifts of its deeper features. Cheap proxy:
    # logits differ for a half-window-rolled input.
    x2 = jnp.roll(x, shift=(2, 2), axis=(1, 2))
    logits2 = fwd(variables, x2)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2), atol=1e-4)


def test_cifar100c_uint8_wire_matches_host_normalize(fake_c100c):
    """The robustness sweep's default path (uint8 wire + in-jit normalize +
    K-scanned eval dispatch, incl. a ragged tail) must report the same
    metrics as host-side float32 normalization with per-batch dispatch."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.data.corruptions import CIFAR100_MEAN, CIFAR100_STD
    from outgridvit_tpu.training.bench_eval import evaluate_one_epoch_logs
    from outgridvit_tpu.training.optim import make_optimizer
    from outgridvit_tpu.training.steps import (
        make_eval_step, make_eval_superstep)
    from outgridvit_tpu.training.train_state import TrainState

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=2)(x)
            x = nn.relu(x)
            return nn.Dense(100)(x.mean(axis=(1, 2)))

    model = Tiny()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats={}, tx=make_optimizer(1e-3))

    host = get_cifar100c_loader("fog", 2, str(fake_c100c), batch_size=2000)
    wire = get_cifar100c_loader("fog", 2, str(fake_c100c), batch_size=2000,
                                device_normalize=True)
    assert wire.device_normalize == (CIFAR100_MEAN, CIFAR100_STD)
    assert next(iter(wire))[0].dtype == np.uint8
    assert host.device_normalize is None

    m_host = evaluate_one_epoch_logs(
        make_eval_step(model.apply), state, host,
        warmup_batches=0, verbose=False)
    norm = (CIFAR100_MEAN, CIFAR100_STD)
    m_wire = evaluate_one_epoch_logs(
        make_eval_step(model.apply, normalize=norm), state, wire,
        warmup_batches=0, verbose=False,
        eval_superstep=make_eval_superstep(model.apply, normalize=norm), k=2)
    assert m_wire["num_images"] == m_host["num_images"] == 10000
    for key in ("loss", "top1", "top3", "top5"):
        np.testing.assert_allclose(m_wire[key], m_host[key],
                                   rtol=1e-5, atol=1e-5)
