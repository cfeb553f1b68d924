"""End-to-end learning check: the full train step must actually optimize
(overfit a tiny fixed dataset far beyond chance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outgridvit_tpu.models import MaxOutNet
from outgridvit_tpu.stage_config import StageCfg
from outgridvit_tpu.training.optim import make_optimizer, warmup_cosine_lr
from outgridvit_tpu.training.steps import StepConfig, make_eval_step, make_train_step
from outgridvit_tpu.training.train_state import TrainState


@pytest.mark.slow
def test_overfits_tiny_dataset():
    num_classes = 4
    stages = (
        StageCfg(dim=16, depth=1, num_heads=2, grid_size=2, outlook_heads=2,
                 mlp_ratio=2.0, mbconv_expand_ratio=2.0),
    )
    model = MaxOutNet(num_classes=num_classes, stages=stages, stem_dim=16,
                      dpr_max=0.0, use_pallas=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 8, 8, 3)).astype(np.float32))
    y = jnp.asarray(np.arange(16) % num_classes)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    n_steps = 120
    schedule = warmup_cosine_lr(3e-3, n_steps, 10, 1e-5)
    tx = make_optimizer(schedule, weight_decay=0.0, grad_clip_norm=1.0)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx)

    # no mixing: pure memorization signal
    step = make_train_step(StepConfig(num_classes=num_classes,
                                      label_smoothing=0.0), schedule)
    eval_step = make_eval_step(model.apply)

    base = jax.random.PRNGKey(1)
    first_loss = None
    for i in range(n_steps):
        state, m = step(state, (x, y), base)
        if first_loss is None:
            first_loss = float(m["loss"])
    final = eval_step(state.params, state.batch_stats, (x, y))
    assert float(final["loss"]) < first_loss * 0.5, (
        f"loss did not halve: {first_loss} -> {float(final['loss'])}")
    assert float(final["top1"]) >= 75.0, float(final["top1"])
    assert int(state.step) == n_steps


def test_loss_decreases_50_steps():
    """Default-tier learning guard: 50 real train steps on a fixed batch
    must clearly reduce the loss. The heavy overfit check (120 steps,
    top1 >= 75%) stays in the slow tier; this one runs on every
    `pytest -q` so a silent optimizer/step regression cannot ship."""
    num_classes = 4
    stages = (
        StageCfg(dim=8, depth=1, num_heads=2, grid_size=2, outlook_heads=2,
                 mlp_ratio=2.0, mbconv_expand_ratio=2.0),
    )
    model = MaxOutNet(num_classes=num_classes, stages=stages, stem_dim=8,
                      dpr_max=0.0, use_pallas=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 8, 8, 3)).astype(np.float32))
    y = jnp.asarray(np.arange(16) % num_classes)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    n_steps = 50
    schedule = warmup_cosine_lr(3e-3, n_steps, 5, 1e-5)
    tx = make_optimizer(schedule, weight_decay=0.0, grad_clip_norm=1.0)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx)
    step = make_train_step(StepConfig(num_classes=num_classes,
                                      label_smoothing=0.0), schedule)
    base = jax.random.PRNGKey(1)
    first_loss = None
    for _ in range(n_steps):
        state, m = step(state, (x, y), base)
        if first_loss is None:
            first_loss = float(m["loss"])
    final = make_eval_step(model.apply)(state.params, state.batch_stats, (x, y))
    assert np.isfinite(float(final["loss"]))
    assert float(final["loss"]) < first_loss * 0.65, (
        f"loss did not drop: {first_loss} -> {float(final['loss'])}")
    assert int(state.step) == n_steps
