"""Device-side augmentation (ops/augment.py) vs the host/PIL pipeline
(data/transforms.py): every RandAugment op must reproduce PIL's integer
semantics; crop/flip/normalize/erasing must match the host twins'
behavior. The host implementation is itself parity-tested against the
reference recipe (`src/data/load_cifrar100.py:44-60`)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from PIL import Image, ImageEnhance, ImageOps  # noqa: E402

from outgridvit_tpu.data import transforms as T  # noqa: E402
from outgridvit_tpu.ops import augment as A  # noqa: E402


def _imgs(b=4, size=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (b, size, size, 3), dtype=np.uint8)


def _pil_batch(fn, imgs):
    return np.stack([np.asarray(fn(Image.fromarray(im))) for im in imgs])


@pytest.mark.parametrize("name,v", [
    ("Brightness", 0.55), ("Brightness", -0.4),
    ("Color", 0.9), ("Contrast", -0.3), ("Sharpness", 0.7),
])
def test_enhance_ops_match_pil(name, v):
    imgs = _imgs()
    x = jnp.asarray(imgs.astype(np.int32))
    f = jnp.full((imgs.shape[0],), 1.0 + v, jnp.float32)
    dev = {
        "Brightness": A._brightness, "Color": A._color,
        "Contrast": A._contrast, "Sharpness": A._sharpness,
    }[name]
    got = np.asarray(dev(x, f)).astype(np.uint8)
    enh = {"Brightness": ImageEnhance.Brightness, "Color": ImageEnhance.Color,
           "Contrast": ImageEnhance.Contrast,
           "Sharpness": ImageEnhance.Sharpness}[name]
    want = _pil_batch(lambda im: enh(im).enhance(1.0 + v), imgs)
    np.testing.assert_array_equal(got, want)


def test_posterize_solarize_match_pil():
    imgs = _imgs()
    x = jnp.asarray(imgs.astype(np.int32))
    got = np.asarray(A._posterize(x, jnp.full((4,), 3, jnp.int32)))
    want = _pil_batch(lambda im: ImageOps.posterize(im, 3), imgs)
    np.testing.assert_array_equal(got.astype(np.uint8), want)

    got = np.asarray(A._solarize(x, jnp.full((4,), 128, jnp.int32)))
    want = _pil_batch(lambda im: ImageOps.solarize(im, 128), imgs)
    np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_autocontrast_equalize_match_pil():
    imgs = _imgs()
    x = jnp.asarray(imgs.astype(np.int32))
    got = np.asarray(A._autocontrast(x)).astype(np.uint8)
    want = _pil_batch(ImageOps.autocontrast, imgs)
    np.testing.assert_array_equal(got, want)

    got = np.asarray(A._equalize(x)).astype(np.uint8)
    want = _pil_batch(ImageOps.equalize, imgs)
    np.testing.assert_array_equal(got, want)

    # constant image: equalize must be identity (PIL's <=1-bin branch)
    const = jnp.full((1, 8, 8, 3), 77, jnp.int32)
    np.testing.assert_array_equal(np.asarray(A._equalize(const)), 77)


@pytest.mark.parametrize("name,v", [
    ("ShearX", 0.23), ("ShearY", -0.19), ("TranslateX", 3.7),
    ("TranslateY", -2.4), ("Rotate", 7.0), ("Rotate", -23.5),
])
def test_geometric_ops_match_pil(name, v):
    imgs = _imgs(size=16, seed=3)
    B = imgs.shape[0]
    name_to_id = {n: i for i, n in enumerate(A._OP_NAMES)}
    op_id = jnp.full((B,), name_to_id[name], jnp.int32)
    mat = A._geo_matrices(op_id, jnp.full((B,), v, jnp.float32), 16, 16,
                          name_to_id)
    got = np.asarray(
        A._affine_warp_nearest(jnp.asarray(imgs.astype(np.int32)), mat)
    ).astype(np.uint8)
    fn = {"ShearX": T._shear_x, "ShearY": T._shear_y,
          "TranslateX": T._translate_x, "TranslateY": T._translate_y,
          "Rotate": T._rotate}[name]
    want = _pil_batch(lambda im: fn(im, v), imgs)
    np.testing.assert_array_equal(got, want)


def test_rand_augment_batch_valid_and_varied():
    imgs = _imgs(b=16, size=16, seed=4)
    out = np.asarray(A.rand_augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(imgs.astype(np.int32)), 2, 7))
    assert out.dtype == np.int32
    assert out.min() >= 0 and out.max() <= 255
    # with 16 images and 14 ops, at least some must differ from the input
    assert (out != imgs).any()
    # identity-op images must be possible: different key -> different result
    out2 = np.asarray(A.rand_augment_batch(
        jax.random.PRNGKey(1), jnp.asarray(imgs.astype(np.int32)), 2, 7))
    assert (out != out2).any()


def test_random_crop_batch_semantics():
    imgs = _imgs(b=8, size=8, seed=5)
    out = np.asarray(A.random_crop_batch(
        jax.random.PRNGKey(0), jnp.asarray(imgs.astype(np.int32)), 2))
    assert out.shape == imgs.shape
    # every output row/col is either a shifted view or zero padding;
    # offset (2,2) reproduces the identity for at least the center crop
    padded = np.pad(imgs, ((0, 0), (2, 2), (2, 2), (0, 0)))
    ok = []
    for b in range(8):
        ok.append(any(
            (out[b] == padded[b, t:t + 8, l:l + 8]).all()
            for t in range(5) for l in range(5)))
    assert all(ok)


def test_cropflip_composition_equals_sequential():
    """The composed crop+flip warp must equal crop followed by flip
    (matrix composition is exact for these integer maps)."""
    imgs = _imgs(b=16, size=8, seed=9).astype(np.int32)
    x = jnp.asarray(imgs)
    k_crop, k_flip = jax.random.split(jax.random.PRNGKey(3))
    seq = A.random_crop_batch(k_crop, x, 2)
    flip = jax.random.uniform(k_flip, (16,)) < 0.5
    seq = jnp.where(flip[:, None, None, None], seq[:, :, ::-1], seq)
    m = A._compose_affine(A._crop_matrix(k_crop, 16, 2),
                          A._flip_matrix(k_flip, 16, 8, 0.5))
    comp = A._affine_warp_nearest(x, m)
    np.testing.assert_array_equal(np.asarray(comp), np.asarray(seq))


def test_random_hflip_batch():
    imgs = _imgs(b=32, size=8, seed=6).astype(np.int32)
    out = np.asarray(A.random_hflip_batch(jax.random.PRNGKey(0),
                                          jnp.asarray(imgs)))
    flipped = (out == imgs[:, :, ::-1]).all(axis=(1, 2, 3))
    same = (out == imgs).all(axis=(1, 2, 3))
    assert (flipped | same).all()
    assert flipped.any() and same.any()


def test_normalize_matches_host():
    imgs = _imgs(b=2)
    mean, std = (0.5, 0.4, 0.3), (0.2, 0.3, 0.4)
    got = np.asarray(A.normalize_batch(jnp.asarray(imgs.astype(np.int32)),
                                       mean, std))
    want = np.stack([T.normalize(im, mean, std) for im in imgs])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_random_erasing_batch_semantics():
    x = jnp.zeros((16, 16, 16, 3), jnp.float32)
    out = np.asarray(A.random_erasing_batch(jax.random.PRNGKey(0), x, p=1.0))
    # every image gets exactly one noise rectangle (nonzero block)
    per_img = (out != 0).any(-1)
    for b in range(16):
        rows = np.where(per_img[b].any(1))[0]
        cols = np.where(per_img[b].any(0))[0]
        assert len(rows) > 0
        block = per_img[b][rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1]
        assert block.all()  # contiguous rectangle
        area_frac = block.size / 256.0
        assert 0.01 <= area_frac <= 0.25
    out2 = np.asarray(A.random_erasing_batch(jax.random.PRNGKey(1), x, p=0.0))
    assert (out2 == 0).all()


def test_augment_train_batch_end_to_end():
    cfg = A.AugmentConfig(mean=(0.5,) * 3, std=(0.25,) * 3, crop_pad=4,
                          ra_num_ops=2, ra_magnitude=7, random_erasing_p=0.25)
    imgs = _imgs(b=8, size=16, seed=7)
    out = jax.jit(lambda k, x: A.augment_train_batch(k, x, cfg))(
        jax.random.PRNGKey(0), jnp.asarray(imgs))
    out = np.asarray(out)
    assert out.shape == (8, 16, 16, 3) and out.dtype == np.float32
    assert np.isfinite(out).all()
    # disabled-augs path = plain normalize
    cfg_off = A.AugmentConfig(mean=(0.5,) * 3, std=(0.25,) * 3, crop_pad=4,
                              enable_augs=False)
    out_off = np.asarray(A.augment_train_batch(
        jax.random.PRNGKey(0), jnp.asarray(imgs), cfg_off))
    want = (imgs.astype(np.float32) / 255.0 - 0.5) / 0.25
    np.testing.assert_allclose(out_off, want, rtol=1e-5)


def test_eval_device_normalize_matches_host_eval_path():
    """device_augment loaders ship uint8 EVAL batches + a device_normalize
    marker; make_eval_step(normalize=...) must equal the host EvalTransform
    -> eval_step path exactly (same uint8 resize, twin normalizes)."""
    import jax.numpy as jnp

    from outgridvit_tpu.data import transforms as T
    from outgridvit_tpu.ops import augment as A
    from outgridvit_tpu.training.steps import make_eval_step

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    mean, std = (0.5, 0.4, 0.45), (0.25, 0.2, 0.3)

    def apply_fn(variables, x, train=False):
        # identity "model": logits are channel means, enough to compare paths
        return jnp.mean(x, axis=(1, 2))

    host = np.stack([T.normalize(im, mean, std) for im in imgs])
    labels = np.zeros((4,), np.int64)
    es_host = make_eval_step(apply_fn, jit=False)
    es_dev = make_eval_step(apply_fn, jit=False, normalize=(mean, std))
    m_host = es_host({}, {}, (jnp.asarray(host), jnp.asarray(labels)))
    m_dev = es_dev({}, {}, (jnp.asarray(imgs.astype(np.int32)),
                            jnp.asarray(labels)))
    np.testing.assert_allclose(np.asarray(m_host["loss"]),
                               np.asarray(m_dev["loss"]), rtol=1e-6)


def test_make_loaders_eval_device_normalize_marker():
    from outgridvit_tpu.data.datasets import _make_loaders

    rng = np.random.default_rng(1)
    xtr = rng.integers(0, 256, (32, 16, 16, 3), dtype=np.uint8)
    xte = rng.integers(0, 256, (16, 16, 16, 3), dtype=np.uint8)
    tr, va, te = _make_loaders(
        xtr, np.zeros(32, np.int64), xte, np.zeros(16, np.int64),
        native_size=16, mean=(0.5,) * 3, std=(0.25,) * 3, batch_size=8,
        val_split=0.25, seed=0, img_size=16, device_augment=True)
    assert te.device_normalize == ((0.5,) * 3, (0.25,) * 3)
    assert va.device_normalize == ((0.5,) * 3, (0.25,) * 3)
    xb, _ = next(iter(te))
    assert xb.dtype == np.uint8  # raw on the wire


def test_full_recipe_matches_host_replay():
    """VERDICT r2 item 3, leg 2: the FULL composed device recipe (crop+flip
    warp -> RandAugment -> normalize -> erase) equals a host/PIL replay fed
    the SAME concrete draws — covers composition order and the fused warp,
    not just each op in isolation."""
    size, B, num_ops = 20, 16, 2
    cfg = A.AugmentConfig(mean=(0.507, 0.487, 0.441), std=(0.267, 0.256, 0.276),
                          crop_pad=4, ra_num_ops=num_ops, ra_magnitude=7,
                          random_erasing_p=0.6)
    imgs = _imgs(b=B, size=size, seed=11)
    key = jax.random.PRNGKey(3)
    draws = jax.tree.map(np.asarray, A.sample_augment_draws(
        key, (B, size, size, 3), cfg))
    dev = np.asarray(jax.jit(
        lambda x: A.apply_augment_draws(x, draws, cfg))(jnp.asarray(imgs)))
    # the fused path consumes the key identically (ulp-level diffs only:
    # baked-in numpy draws const-fold differently than traced ones)
    fused = np.asarray(A.augment_train_batch(key, jnp.asarray(imgs), cfg))
    np.testing.assert_allclose(dev, fused, atol=1e-6)

    space = T._ra_space(T._NUM_BINS, size)
    covered = set()
    for i in range(B):
        p = cfg.crop_pad
        padded = np.pad(imgs[i], ((p, p), (p, p), (0, 0)))
        t, l = int(draws.crop_top[i]), int(draws.crop_left[i])
        im = padded[t:t + size, l:l + size]
        if draws.flip[i]:
            im = im[:, ::-1]
        pil = Image.fromarray(np.ascontiguousarray(im))
        for s in range(num_ops):
            name = A._OP_NAMES[int(draws.op_ids[s, i])]
            covered.add(name)
            mags, signed = space[name]
            v = float(mags[cfg.ra_magnitude]) if mags is not None else 0.0
            if signed and draws.signs[s, i] < 0:
                v = -v
            pil = T._RA_FNS[name](pil, v)
        xf = T.normalize(np.asarray(pil), cfg.mean, cfg.std)
        if draws.er_apply[i]:
            et, el = int(draws.er_top[i]), int(draws.er_left[i])
            eh, ew = int(draws.er_h[i]), int(draws.er_w[i])
            xf[et:et + eh, el:el + ew] = draws.er_noise[i, et:et + eh,
                                                        el:el + ew]
        np.testing.assert_allclose(dev[i], xf, atol=2e-6,
                                   err_msg=f"image {i}: ops "
                                   f"{[A._OP_NAMES[int(draws.op_ids[s, i])] for s in range(num_ops)]}")
    assert len(covered) >= 8  # the draw actually exercises the op space
    assert any(draws.er_apply) and any(draws.flip)
