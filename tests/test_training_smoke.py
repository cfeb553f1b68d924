"""End-to-end CPU train smoke (mirrors reference
`tests/test_training_smoke.py:32-75`): one epoch of the real `train_model`
path on synthetic data; history lengths == 1 and both checkpoints exist.
Plus resume and mixing/optim unit checks."""

import numpy as np
import pytest

from outgridvit_tpu.data.datasets import get_synthetic_dataloaders
from outgridvit_tpu.models import MaxOutNet
from outgridvit_tpu.stage_config import StageCfg


def tiny_model(num_classes=10):
    stages = (
        StageCfg(dim=8, depth=1, num_heads=2, grid_size=2, outlook_heads=2,
                 mlp_ratio=2.0, mbconv_expand_ratio=2.0),
    )
    return MaxOutNet(num_classes=num_classes, stages=stages, stem_dim=8,
                     use_pallas=False)


def test_train_one_epoch_smoke(tmp_path):
    from outgridvit_tpu.training import train_model

    train_loader, _, _ = get_synthetic_dataloaders(
        batch_size=8, num_samples=16, img_size=8, num_classes=10, seed=0)
    model = tiny_model()
    best = tmp_path / "best.ckpt"
    last = tmp_path / "last.ckpt"
    history, state = train_model(
        model=model,
        train_loader=train_loader,
        epochs=1,
        val_loader=train_loader,
        use_amp=False,
        grad_clip_norm=1.0,
        print_every=2,
        save_path=str(best),
        last_path=str(last),
        mixup_alpha=0.2,
        cutmix_alpha=1.0,
        mix_prob=0.5,
        num_classes=10,
        early_stop=False,
        seed=0,
    )
    for k in ("train_loss", "train_top1", "val_loss", "val_top1", "lr"):
        assert len(history[k]) == 1, k
    assert np.isfinite(history["train_loss"][0])
    assert best.exists() and last.exists()
    assert int(state.step) == len(train_loader)


def test_resume_roundtrip(tmp_path):
    from outgridvit_tpu.training import train_model

    train_loader, _, _ = get_synthetic_dataloaders(
        batch_size=8, num_samples=16, img_size=8, num_classes=10, seed=0)
    model = tiny_model()
    last = tmp_path / "last.ckpt"
    h1, s1 = train_model(
        model=model, train_loader=train_loader, epochs=1, val_loader=None,
        use_amp=False, print_every=0, save_path=str(tmp_path / "b.ckpt"),
        last_path=str(last), num_classes=10, early_stop=False, seed=0,
    )
    # resume from epoch 1, run through epoch 2
    h2, s2 = train_model(
        model=model, train_loader=train_loader, epochs=2, val_loader=None,
        use_amp=False, print_every=0, save_path=str(tmp_path / "b.ckpt"),
        last_path=str(last), resume_path=str(last), num_classes=10,
        early_stop=False, seed=0,
    )
    assert len(h2["train_loss"]) == 1  # only epoch 2 ran
    assert int(s2.step) == 2 * len(train_loader)


def test_train_epoch_with_device_augment(tmp_path):
    """Raw uint8 loader + in-jit augmentation recipe through the real
    train_model path (the TPU-first input pipeline, ops/augment.py)."""
    from outgridvit_tpu.training import train_model

    train_loader, _, _ = get_synthetic_dataloaders(
        batch_size=8, num_samples=16, img_size=8, num_classes=10, seed=0,
        device_augment=True)
    assert train_loader.device_augment is not None
    x0, _ = next(iter(train_loader))
    assert x0.dtype == np.uint8  # host feeds raw pixels
    history, state = train_model(
        model=tiny_model(), train_loader=train_loader, epochs=1,
        val_loader=None, use_amp=False, print_every=0,
        save_path=str(tmp_path / "b.ckpt"), last_path=str(tmp_path / "l.ckpt"),
        mixup_alpha=0.2, cutmix_alpha=1.0, mix_prob=0.5,
        num_classes=10, early_stop=False, seed=0)
    assert np.isfinite(history["train_loss"][0])
    assert int(state.step) == len(train_loader)


def test_superstep_matches_sequential_steps():
    """lax.scan-of-K-steps must produce the same state and metrics as K
    sequential single-step dispatches (same rng fold on state.step; only
    XLA fusion-order float noise ~1e-8 may differ)."""
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.training.optim import make_optimizer, warmup_cosine_lr
    from outgridvit_tpu.training.steps import (
        StepConfig, make_train_step, make_train_superstep)
    from outgridvit_tpu.training.train_state import TrainState

    model = tiny_model()
    K, bs = 3, 4
    xs = jax.random.normal(jax.random.PRNGKey(0), (K, bs, 8, 8, 3))
    ys = (jnp.arange(K * bs) % 10).reshape(K, bs)
    schedule = warmup_cosine_lr(1e-3, 100, 10)
    cfg = StepConfig(num_classes=10, mixup_alpha=0.2, cutmix_alpha=1.0,
                     mix_prob=0.5, grad_clip_norm=1.0)

    def init_state():
        variables = jax.jit(model.init)(jax.random.PRNGKey(1), xs[0])
        return TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=make_optimizer(schedule, 0.05, 1.0))

    base = jax.random.PRNGKey(2)
    step = make_train_step(cfg, lr_schedule=schedule)
    s1 = init_state()
    ms = []
    for i in range(K):
        s1, m = step(s1, (xs[i], ys[i]), base)
        ms.append(m)

    superstep = make_train_superstep(cfg, lr_schedule=schedule)
    s2, msup = superstep(init_state(), (xs, ys), base)

    assert int(s2.step) == int(s1.step) == K
    for l1, l2 in zip(jax.tree_util.tree_leaves(s1.params),
                      jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)
    for i in range(K):
        for k in ms[i]:
            np.testing.assert_allclose(float(msup[k][i]), float(ms[i][k]),
                                       rtol=1e-5, atol=1e-6)


def test_eval_superstep_matches_sequential_and_epoch_metrics():
    """The K-scanned eval dispatch must be bit-identical to K sequential
    eval steps, and evaluate_one_epoch_logs with k>1 (incl. a ragged tail
    that falls back to single steps) must report the same loss/top-k."""
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.training.bench_eval import evaluate_one_epoch_logs
    from outgridvit_tpu.training.optim import make_optimizer
    from outgridvit_tpu.training.steps import (
        make_eval_step, make_eval_superstep)
    from outgridvit_tpu.training.train_state import TrainState

    model = tiny_model()
    K, bs = 3, 4
    xs = jax.random.normal(jax.random.PRNGKey(0), (K, bs, 8, 8, 3))
    ys = (jnp.arange(K * bs) % 10).reshape(K, bs)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), xs[0])
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(1e-3))

    estep = make_eval_step(model.apply)
    esuper = make_eval_superstep(model.apply)
    msup = esuper(state.params, state.batch_stats, (xs, ys))
    for i in range(K):
        m = estep(state.params, state.batch_stats, (xs[i], ys[i]))
        for key in m:
            np.testing.assert_allclose(float(msup[key][i]), float(m[key]),
                                       rtol=1e-6, atol=1e-7)

    # 5 batches through k=2 superdispatch (2 superbatches + 1 tail) must
    # report the same epoch metrics as the per-batch path
    batches = [(np.asarray(jax.random.normal(jax.random.PRNGKey(10 + i),
                                             (bs, 8, 8, 3))),
                np.asarray((jnp.arange(bs) + i) % 10)) for i in range(5)]
    m1 = evaluate_one_epoch_logs(estep, state, batches, warmup_batches=0,
                                 verbose=False)
    m2 = evaluate_one_epoch_logs(estep, state, batches, warmup_batches=0,
                                 verbose=False, eval_superstep=esuper, k=2)
    for key in ("loss", "top1", "top3", "top5", "num_images"):
        np.testing.assert_allclose(m2[key], m1[key], rtol=1e-6, atol=1e-6)


@pytest.mark.slow  # ~30s on the 1-vCPU box; scan equivalence stays fast
def test_grouped_batches_superdispatch_epoch(tmp_path):
    """train_model with steps_per_dispatch>1: full groups scan, the ragged
    tail and <K remainder run as singles; history means unchanged."""
    from outgridvit_tpu.training import train_model

    # 36 samples / bs 8 -> 4 full batches + ragged 4: K=3 -> one scan(3),
    # one single full, one ragged single
    train_loader, _, _ = get_synthetic_dataloaders(
        batch_size=8, num_samples=36, img_size=8, num_classes=10, seed=0)
    history, state = train_model(
        model=tiny_model(), train_loader=train_loader, epochs=1,
        val_loader=None, use_amp=False, print_every=2,
        save_path=str(tmp_path / "b.ckpt"), last_path=str(tmp_path / "l.ckpt"),
        num_classes=10, early_stop=False, seed=0, steps_per_dispatch=3)
    assert np.isfinite(history["train_loss"][0])
    assert int(state.step) == len(train_loader)  # all 5 steps ran


def test_mixup_cutmix_semantics():
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.training.mixing import apply_mixup_cutmix

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3))
    y = jnp.arange(8) % 4

    # disabled -> identity + one-hot
    x2, t = apply_mixup_cutmix(rng, x, y, 4, 0.0, 0.0, 1.0)
    assert (x2 == x).all()
    np.testing.assert_allclose(np.asarray(t.sum(-1)), 1.0, rtol=1e-6)

    # enabled -> soft targets still sum to 1, at most two classes mixed
    x3, t3 = apply_mixup_cutmix(rng, x, y, 4, 0.8, 1.0, 1.0)
    np.testing.assert_allclose(np.asarray(t3.sum(-1)), 1.0, rtol=1e-5)
    assert (np.asarray((t3 > 0).sum(-1)) <= 2).all()
    assert np.isfinite(np.asarray(x3)).all()


def test_warmup_cosine_schedule():
    from outgridvit_tpu.training.optim import warmup_cosine_lr

    sched = warmup_cosine_lr(1.0, total_steps=100, warmup_steps=10, min_lr=0.01)
    # warmup: t=count+1 over warmup_steps
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(9)) == pytest.approx(1.0)
    # end of cosine
    assert float(sched(99)) == pytest.approx(0.01, abs=1e-6)
    # midpoint of cosine
    mid = float(sched(54))  # t=55, progress=0.5
    assert mid == pytest.approx(0.01 + (1.0 - 0.01) * 0.5, rel=1e-3)


def test_losses_match_torch_semantics():
    import jax.numpy as jnp

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from outgridvit_tpu.training.losses import (
        cross_entropy_smoothed,
        soft_target_cross_entropy,
    )

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 7)).astype(np.float32)
    labels = rng.integers(0, 7, size=(4,))
    soft = rng.random((4, 7)).astype(np.float32)
    soft /= soft.sum(-1, keepdims=True)

    want = F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                           label_smoothing=0.1).item()
    got = float(cross_entropy_smoothed(jnp.asarray(logits),
                                       jnp.asarray(labels), 0.1))
    assert got == pytest.approx(want, rel=1e-5)

    logp = F.log_softmax(torch.tensor(logits), dim=1)
    want2 = -(torch.tensor(soft) * logp).sum(1).mean().item()
    got2 = float(soft_target_cross_entropy(jnp.asarray(logits),
                                           jnp.asarray(soft)))
    assert got2 == pytest.approx(want2, rel=1e-5)


def test_log_line_format_matches_reference(capsys):
    """The printed train/val lines must keep the reference's format
    (`one_epoch_train.py:180-186`, `train_full_model.py:202-256`) so log
    parsers written for the reference keep working."""
    import re

    from outgridvit_tpu.training import train_model

    train_loader, _, _ = get_synthetic_dataloaders(
        batch_size=8, num_samples=16, img_size=8, num_classes=10, seed=0)
    model = tiny_model()
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        # same model/loader/mixing config as test_train_one_epoch_smoke so
        # the jitted train/eval programs come from the compilation cache
        train_model(
            model=model, train_loader=train_loader, epochs=1,
            val_loader=train_loader, use_amp=False, print_every=2,
            save_path=os.path.join(d, "b.ckpt"),
            last_path=os.path.join(d, "l.ckpt"),
            mixup_alpha=0.2, cutmix_alpha=1.0, mix_prob=0.5,
            grad_clip_norm=1.0,
            num_classes=10, early_stop=False, seed=0)
    out = capsys.readouterr().out
    assert re.search(
        r"\[train step \d+/\d+\] loss \d+\.\d{4} \| top1 \d+\.\d{2}% \| "
        r"top3 \d+\.\d{2}% \| top5 \d+\.\d{2}% \| [\d.]+ img/s \| "
        r"lr \d\.\d{2}e[+-]\d+ \| gnorm \d+\.\d{3} \| clip \d+\.\d% \| "
        r"oflow \d+ \| nonfinite \d+ \| scale 1\.0", out), out
    assert re.search(r"\[Train\] loss \d+\.\d{4} \| top1 \d+\.\d{2}%", out)
    assert re.search(r"\[Val\]   loss \d+\.\d{4} \| top1 \d+\.\d{2}%", out)
    assert "=== Run config ===" in out


def test_run_eval_superstep_matches_per_batch():
    """loop._run_eval with the K-scanned eval dispatch (ragged tail
    included) must report the same weighted metrics as per-batch eval."""
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.training.loop import _run_eval
    from outgridvit_tpu.training.optim import make_optimizer
    from outgridvit_tpu.training.steps import (
        make_eval_step, make_eval_superstep)
    from outgridvit_tpu.training.train_state import TrainState

    model = tiny_model()
    bs = 4
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1), jnp.zeros((bs, 8, 8, 3)))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(1e-3))
    batches = [(np.asarray(jax.random.normal(jax.random.PRNGKey(20 + i),
                                             (bs, 8, 8, 3))),
                np.asarray((jnp.arange(bs) + i) % 10)) for i in range(5)]
    estep = make_eval_step(model.apply)
    m1 = _run_eval(estep, state, batches)
    m2 = _run_eval(estep, state, batches,
                   eval_superstep=make_eval_superstep(model.apply), k=2)
    for key in ("loss", "top1", "top3", "top5"):
        np.testing.assert_allclose(m2[key], m1[key], rtol=1e-6, atol=1e-6)


def test_one_shot_iterator_loader_trains_all_batches(tmp_path):
    """A loader whose __iter__ hands out a single-use iterator (a plain
    generator-style loader a user plugs in) must not lose its first batch
    to shape-peeking in train_model (training/loop.py)."""
    from outgridvit_tpu.training import train_model

    rng = np.random.default_rng(0)
    batches = [
        (rng.standard_normal((8, 8, 8, 3)).astype(np.float32),
         (np.arange(8) + i) % 10)
        for i in range(3)
    ]

    class OneShotLoader:
        def __init__(self, bs):
            self._bs = bs
            self.consumed = 0

        def __len__(self):
            return len(self._bs)

        def __iter__(self):
            return self  # one-shot: every call returns the same iterator

        def __next__(self):
            if self.consumed >= len(self._bs):
                raise StopIteration
            b = self._bs[self.consumed]
            self.consumed += 1
            return b

    loader = OneShotLoader(batches)
    history, state = train_model(
        model=tiny_model(), train_loader=loader, epochs=1, val_loader=None,
        use_amp=False, print_every=0, save_path=str(tmp_path / "b.ckpt"),
        last_path=str(tmp_path / "l.ckpt"), num_classes=10,
        early_stop=False, seed=0)
    assert loader.consumed == 3
    assert int(state.step) == 3  # all batches trained, none dropped
