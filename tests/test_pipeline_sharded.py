"""Prefetcher + sharded eval over ragged batches on a multi-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outgridvit_tpu.data.pipeline import ArrayDataLoader, Prefetcher
from outgridvit_tpu.parallel import batch_sharding, make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_prefetcher_handles_ragged_last_batch():
    mesh = make_mesh((8, 1))
    shard = batch_sharding(mesh)
    # 20 samples, batch 8 -> last batch has 4 rows (not divisible by 8)
    images = np.random.default_rng(0).standard_normal((20, 4, 4, 3)).astype(
        np.float32)
    labels = np.arange(20) % 3
    loader = ArrayDataLoader(images, labels, batch_size=8)
    batches = list(Prefetcher(iter(loader), sharding=shard))
    assert [b[0].shape[0] for b in batches] == [8, 8, 4]

    # a jitted mean over each batch must still run (GSPMD reshards)
    f = jax.jit(lambda x: x.mean())
    for x, y in batches:
        assert np.isfinite(float(f(x)))


def test_eval_loop_on_mesh_with_ragged_batches():
    from outgridvit_tpu.models import MaxOutNet
    from outgridvit_tpu.stage_config import StageCfg
    from outgridvit_tpu.training.loop import _run_eval
    from outgridvit_tpu.training.steps import make_eval_step

    mesh = make_mesh((8, 1))
    model = MaxOutNet(
        num_classes=5,
        stages=(StageCfg(dim=8, depth=1, num_heads=2, grid_size=2,
                         outlook_heads=2, mlp_ratio=2.0,
                         mbconv_expand_ratio=2.0),),
        stem_dim=8, use_pallas=False)
    x0 = jnp.zeros((8, 8, 8, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

    images = np.random.default_rng(0).standard_normal((20, 8, 8, 3)).astype(
        np.float32)
    labels = (np.arange(20) % 5).astype(np.int64)
    loader = ArrayDataLoader(images, labels, batch_size=8)

    class S:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

    eval_step = make_eval_step(model.apply)
    out = _run_eval(eval_step, S, loader, batch_sharding(mesh))
    assert np.isfinite(out["loss"])
    assert 0.0 <= out["top1"] <= 100.0
