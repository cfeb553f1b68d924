"""Inference/serving surface (outgridvit_tpu/serving.py): jitted
fixed-batch predictor semantics (padding, checkpoint restore) and the
jax.export artifact round trip."""

import numpy as np
import pytest

SMOKE_MODEL = {
    "type": "model_a",
    "num_classes": 10,
    "in_ch": 3,
    "stem_dim": 8,
    "stages": [
        {"dim": 8, "depth": 1, "num_heads": 2, "grid_size": 2,
         "outlook_heads": 2},
    ],
}


@pytest.fixture(scope="module")
def predictor():
    from outgridvit_tpu.serving import build_predictor

    return build_predictor(SMOKE_MODEL, batch_size=4, img_size=8,
                           mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))


def test_predictor_pads_ragged_requests(predictor):
    rng = np.random.default_rng(0)
    x4 = rng.integers(0, 255, (4, 8, 8, 3), dtype=np.uint8)
    l4, p4 = predictor.predict(x4)
    assert l4.shape == (4,) and p4.shape == (4, 10)
    np.testing.assert_allclose(p4.sum(axis=-1), 1.0, rtol=1e-3)
    # a 2-image request must give the same answers as rows 0..1 of the
    # full batch (padding must not leak — BatchNorm uses stored stats)
    l2, p2 = predictor.predict(x4[:2])
    np.testing.assert_array_equal(l2, l4[:2])
    np.testing.assert_allclose(p2, p4[:2], rtol=1e-5, atol=1e-6)
    # single image without the batch dim
    l1, _ = predictor.predict(x4[0])
    assert l1.shape == (1,) and l1[0] == l4[0]


def test_predictor_validates_requests(predictor):
    rng = np.random.default_rng(1)
    with pytest.raises(ValueError, match="compiled batch size"):
        predictor.predict(
            rng.integers(0, 255, (5, 8, 8, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="8x8"):
        predictor.predict(
            rng.integers(0, 255, (2, 16, 16, 3), dtype=np.uint8))


def test_predictor_restores_checkpoint(tmp_path):
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.models import build_model
    from outgridvit_tpu.serving import build_predictor
    from outgridvit_tpu.training.checkpoints import save_checkpoint
    from outgridvit_tpu.training.optim import make_optimizer
    from outgridvit_tpu.training.train_state import TrainState

    model = build_model(SMOKE_MODEL, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(3), jnp.zeros((1, 8, 8, 3)))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(1e-3))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(str(ckpt), state, epoch=0)

    direct = build_predictor(SMOKE_MODEL, variables=variables,
                             batch_size=2, img_size=8,
                             mean=(0.5,) * 3, std=(0.25,) * 3)
    restored = build_predictor(SMOKE_MODEL, checkpoint=str(ckpt),
                               batch_size=2, img_size=8,
                               mean=(0.5,) * 3, std=(0.25,) * 3)
    x = np.random.default_rng(4).integers(0, 255, (2, 8, 8, 3),
                                          dtype=np.uint8)
    l1, p1 = direct.predict(x)
    l2, p2 = restored.predict(x)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-6)


def test_export_roundtrip(predictor, tmp_path):
    from outgridvit_tpu.serving import export_predictor, load_predictor

    path = tmp_path / "m.ogvt"
    export_predictor(predictor, str(path))
    loaded = load_predictor(str(path))
    assert (loaded.batch_size, loaded.img_size, loaded.num_classes) == \
        (4, 8, 10)
    x = np.random.default_rng(5).integers(0, 255, (3, 8, 8, 3),
                                          dtype=np.uint8)
    l1, p1 = predictor.predict(x)
    l2, p2 = loaded.predict(x)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError, match="artifact"):
        bogus = tmp_path / "bogus.ogvt"
        bogus.write_bytes(b"NOPE")
        load_predictor(str(bogus))


def test_export_cross_platform(predictor, tmp_path):
    """An artifact lowered for BOTH tpu and cpu (export on the dev box,
    deploy on TPU) must still execute on the cpu host and agree."""
    from outgridvit_tpu.serving import export_predictor, load_predictor

    path = tmp_path / "xplat.ogvt"
    export_predictor(predictor, str(path), platforms=["tpu", "cpu"])
    loaded = load_predictor(str(path))
    x = np.random.default_rng(6).integers(0, 255, (2, 8, 8, 3),
                                          dtype=np.uint8)
    l1, p1 = predictor.predict(x)
    l2, p2 = loaded.predict(x)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-6)


def test_predictor_on_data_mesh(predictor):
    """A predictor sharded over an 8-device data mesh must agree with the
    single-device one (serving scales like training: batch over `data`)."""
    import jax

    from outgridvit_tpu.parallel import make_mesh
    from outgridvit_tpu.serving import build_predictor

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh((8, 1))
    sharded = build_predictor(SMOKE_MODEL, batch_size=8, img_size=8,
                              mean=(0.5,) * 3, std=(0.25,) * 3, mesh=mesh)
    x = np.random.default_rng(7).integers(0, 255, (4, 8, 8, 3),
                                          dtype=np.uint8)
    l1, p1 = predictor.predict(x)
    l2, p2 = sharded.predict(x)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-5)
    with pytest.raises(ValueError, match="divide"):
        build_predictor(SMOKE_MODEL, batch_size=6, img_size=8, mesh=mesh)


def test_predictor_rejects_float_images_and_both_sources(predictor):
    x = np.random.default_rng(8).random((2, 8, 8, 3), dtype=np.float32)
    with pytest.raises(ValueError, match="raw uint8"):
        predictor.predict(x)

    from outgridvit_tpu.serving import build_predictor

    with pytest.raises(ValueError, match="not both"):
        build_predictor(SMOKE_MODEL, variables={"params": {}},
                        checkpoint="x.ckpt")


def test_predict_many_chunks_large_requests(predictor):
    rng = np.random.default_rng(9)
    x = rng.integers(0, 255, (10, 8, 8, 3), dtype=np.uint8)  # 2.5 batches
    labels, probs = predictor.predict_many(x)
    assert labels.shape == (10,) and probs.shape == (10, 10)
    # chunking must agree with per-image predictions
    l0, p0 = predictor.predict(x[4:5])
    assert labels[4] == l0[0]
    np.testing.assert_allclose(probs[4], p0[0], rtol=1e-5, atol=1e-6)
