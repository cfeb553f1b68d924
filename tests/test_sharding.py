"""Multi-device tests on the 8-virtual-CPU mesh (what the reference never had
— SURVEY.md §4 'add multi-device tests')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outgridvit_tpu.parallel import batch_sharding, make_mesh, shard_train_state
from outgridvit_tpu.models import MaxOutNet
from outgridvit_tpu.stage_config import StageCfg
from outgridvit_tpu.training.optim import make_optimizer, warmup_cosine_lr
from outgridvit_tpu.training.steps import StepConfig, make_train_step
from outgridvit_tpu.training.train_state import TrainState

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _make_state(mesh, dtype=jnp.float32):
    stages = (
        StageCfg(dim=32, depth=1, num_heads=2, grid_size=4, outlook_heads=2,
                 mlp_ratio=2.0, mbconv_expand_ratio=2.0),
    )
    model = MaxOutNet(num_classes=10, stages=stages, stem_dim=32,
                      use_pallas=False, dtype=dtype)
    x = jnp.zeros((8, 8, 8, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = make_optimizer(warmup_cosine_lr(1e-3, 100, 10), 0.05, 1.0)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx)
    return model, shard_train_state(state, mesh)


def test_dp_train_step_runs_on_mesh():
    mesh = make_mesh((8, 1))
    model, state = _make_state(mesh)
    step = make_train_step(
        StepConfig(num_classes=10, mixup_alpha=0.8, cutmix_alpha=1.0,
                   mix_prob=0.5))
    bshard = batch_sharding(mesh)
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (16, 8, 8, 3)), bshard)
    y = jax.device_put((jnp.arange(16) % 10).astype(jnp.int32), bshard)
    state, m = step(state, (x, y), jax.random.PRNGKey(2))
    assert float(m["nonfinite"]) == 0.0
    assert float(m["loss"]) > 0.0
    assert int(state.step) == 1


def test_tp_shards_wide_kernels():
    mesh = make_mesh((4, 2))
    model, state = _make_state(mesh)
    # fc1 kernel must actually be sharded over the model axis
    fc1 = state.params["stages_0_0"]["mlp"]["fc1"]["kernel"]
    spec = fc1.sharding.spec
    assert "model" in str(spec), spec
    # and the optimizer moments mirror it
    # (walk opt_state for a leaf with the same shape)
    leaves = jax.tree_util.tree_leaves_with_path(state.opt_state)
    mirrored = [
        l for p, l in leaves
        if getattr(l, "shape", None) == fc1.shape
        and "fc1" in "/".join(str(q) for q in p)
    ]
    assert mirrored and all("model" in str(l.sharding.spec) for l in mirrored)


def test_dp_tp_train_step_runs():
    mesh = make_mesh((4, 2))
    model, state = _make_state(mesh)
    step = make_train_step(StepConfig(num_classes=10))
    bshard = batch_sharding(mesh)
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3)), bshard)
    y = jax.device_put((jnp.arange(8) % 10).astype(jnp.int32), bshard)
    state, m = step(state, (x, y), jax.random.PRNGKey(2))
    assert float(m["nonfinite"]) == 0.0
    assert float(m["loss"]) > 0.0


@pytest.mark.slow
def test_dp_matches_single_device():
    # the same batch through a 1-device and an 8-device mesh must give the
    # same loss (GSPMD global-batch semantics, incl. BatchNorm stats)
    step_cfg = StepConfig(num_classes=10)  # no mixing: deterministic
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 8, 3))
    y = (jnp.arange(16) % 10).astype(jnp.int32)

    losses = []
    for shape in ((1, 1), (8, 1)):
        mesh = make_mesh(shape, devices=jax.devices()[: shape[0] * shape[1]])
        model, state = _make_state(mesh)
        step = make_train_step(step_cfg)
        bshard = batch_sharding(mesh)
        xb = jax.device_put(x, bshard)
        yb = jax.device_put(y, bshard)
        _, m = step(state, (xb, yb), jax.random.PRNGKey(2))
        losses.append(float(m["loss"]))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
def test_superstep_matches_sequential_on_mesh(shape):
    # the PRODUCTION dispatch path (`scripts/train.py` on accelerators):
    # K-scanned superstep WITH in-jit device augmentation, on a sharded
    # mesh, must equal K sequential single-step dispatches (the superstep's
    # documented contract, training/steps.py:150) — this is the multi-chip
    # correctness evidence a single chip cannot provide
    from outgridvit_tpu.ops.augment import AugmentConfig
    from outgridvit_tpu.parallel import superbatch_sharding
    from outgridvit_tpu.training.steps import make_train_superstep

    aug = AugmentConfig(mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25),
                        crop_pad=1)
    step_cfg = StepConfig(num_classes=10, mixup_alpha=0.8, cutmix_alpha=1.0,
                          mix_prob=0.5, augment=aug)
    K, B = 2, 16
    kx, ky = jax.random.split(jax.random.PRNGKey(5))
    x = np.asarray(jax.random.randint(kx, (K, B, 8, 8, 3), 0, 255),
                   dtype=np.uint8)
    y = np.asarray(jax.random.randint(ky, (K, B), 0, 10), dtype=np.int32)
    base = jax.random.PRNGKey(6)

    mesh = make_mesh(shape)
    sshard = superbatch_sharding(mesh)
    bshard = batch_sharding(mesh)

    _, state_scan = _make_state(mesh)
    sstep = make_train_superstep(step_cfg)
    _, m_scan = sstep(state_scan,
                      (jax.device_put(x, sshard), jax.device_put(y, sshard)),
                      base)
    scan_losses = np.asarray(m_scan["loss"])

    _, st = _make_state(mesh)
    step = make_train_step(step_cfg)
    seq_losses = []
    for k in range(K):
        st, m = step(st, (jax.device_put(x[k], bshard),
                          jax.device_put(y[k], bshard)), base)
        seq_losses.append(float(m["loss"]))

    np.testing.assert_array_equal(scan_losses, np.asarray(seq_losses))


@pytest.mark.slow
def test_tp_matches_dp_numerically():
    # tensor-parallel sharding must not change the math: same batch, same
    # params -> same loss on a pure-DP mesh and a DPxTP mesh
    step_cfg = StepConfig(num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 8, 8, 3))
    y = (jnp.arange(16) % 10).astype(jnp.int32)

    losses = []
    for shape in ((8, 1), (4, 2)):
        mesh = make_mesh(shape)
        model, state = _make_state(mesh)
        step = make_train_step(step_cfg)
        bshard = batch_sharding(mesh)
        _, m = step(state, (jax.device_put(x, bshard),
                            jax.device_put(y, bshard)), jax.random.PRNGKey(2))
        losses.append(float(m["loss"]))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)


@pytest.mark.slow  # fresh (4,2) compile ~17s on the 1-vCPU box
def test_tp_step_lowers_to_collectives():
    """The (4,2) DP x TP step must lower to real XLA collectives —
    all-reduces for the data-axis gradient sync and the TP partial sums —
    not silent replication (the sharding annotations actually bind)."""
    mesh = make_mesh((4, 2))
    model, state = _make_state(mesh)
    step = make_train_step(StepConfig(num_classes=10), jit=False)
    bshard = batch_sharding(mesh)
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3)), bshard)
    y = jax.device_put((jnp.arange(8) % 10).astype(jnp.int32), bshard)
    txt = (jax.jit(step)
           .lower(state, (x, y), jax.random.PRNGKey(2))
           .compile().as_text())
    assert "all-reduce" in txt, "no collectives: shardings did not bind"


def test_eval_superstep_epoch_on_mesh():
    """evaluate_one_epoch_logs with k>1 on a data mesh: the [K, B, ...]
    superbatches must shard the BATCH axis (K=2 is not divisible by 8
    devices, so scan-axis sharding would fail outright), and metrics must
    match the per-batch path."""
    from outgridvit_tpu.training.bench_eval import evaluate_one_epoch_logs
    from outgridvit_tpu.training.steps import (
        make_eval_step, make_eval_superstep)

    mesh = make_mesh((8, 1))
    model, state = _make_state(mesh)
    bs = 16
    batches = [(np.asarray(jax.random.normal(jax.random.PRNGKey(10 + i),
                                             (bs, 8, 8, 3))),
                np.asarray((jnp.arange(bs) + i) % 10, dtype=np.int32))
               for i in range(5)]
    shard = batch_sharding(mesh)
    estep = make_eval_step(model.apply)
    m1 = evaluate_one_epoch_logs(estep, state, batches, data_shard=shard,
                                 warmup_batches=0, verbose=False)
    m2 = evaluate_one_epoch_logs(
        estep, state, batches, data_shard=shard, warmup_batches=0,
        verbose=False, eval_superstep=make_eval_superstep(model.apply), k=2)
    assert m2["num_images"] == m1["num_images"] == 5 * bs
    for key in ("loss", "top1", "top3", "top5"):
        np.testing.assert_allclose(m2[key], m1[key], rtol=1e-5, atol=1e-5)


def test_dp_matches_single_device_2dev():
    """Default-tier DP guarantee: the same batch through a 1-device and a
    2-device data mesh gives the same loss (GSPMD global-batch semantics,
    incl. cross-device BatchNorm stats). The 8-device variant stays in the
    slow tier; this runs on every `pytest -q`."""
    step_cfg = StepConfig(num_classes=10)  # no mixing: deterministic
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3))
    y = (jnp.arange(8) % 10).astype(jnp.int32)

    losses = []
    for shape in ((1, 1), (2, 1)):
        mesh = make_mesh(shape, devices=jax.devices()[: shape[0] * shape[1]])
        model, state = _make_state(mesh)
        step = make_train_step(step_cfg)
        bshard = batch_sharding(mesh)
        _, m = step(state, (jax.device_put(x, bshard),
                            jax.device_put(y, bshard)), jax.random.PRNGKey(2))
        losses.append(float(m["loss"]))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)
