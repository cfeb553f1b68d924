"""Device-side (in-jit) batched image augmentation.

TPU-first replacement for the host augmentation pipeline: the reference runs
torchvision transforms in DataLoader worker processes
(`src/data/load_cifrar100.py:44-60`); on a weak host that caps end-to-end
training far below the device's step rate. Here the whole train recipe —
RandomCrop(pad), RandomHorizontalFlip, RandAugment(num_ops, magnitude),
Normalize, RandomErasing — runs inside the jitted train step on the
already-transferred uint8 batch, so the host only slices raw arrays (and the
H2D transfer shrinks 4x: uint8 instead of float32).

Semantics mirror `outgridvit_tpu.data.transforms` (the host/PIL
implementation, itself matching torchvision) including PIL's exact integer
conventions, calibrated op by op:

- affine resampling (shear/translate/rotate): input = floor(M @ (out + 0.5)),
  NEAREST, zero fill; rotate about (W/2, H/2).
- grayscale: L = (19595 R + 38470 G + 7471 B + 0x8000) >> 16.
- enhance blends (brightness/color/contrast/sharpness): float blend with the
  degenerate image, truncated (floor) then clipped to [0, 255]; sharpness'
  degenerate is the 3x3 smooth filter ([1,1,1;1,5,1;1,1,1]/13) rounded, with
  the one-pixel border kept from the original.
- contrast mean: int(mean(L) + 0.5) over the image.
- autocontrast: per-channel lut floor(i * 255/(hi-lo) - lo * 255/(hi-lo)).
- equalize: PIL's integer lut ((step//2 + cumsum h) // step).
- posterize/solarize: bitmask / conditional invert (exact).

Randomness is `jax.random`-keyed per step; the op/sign/magnitude sampling
distributions match the host recipe (uniform over the 14-op space, p=0.5
sign, fixed magnitude bin of 31).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from outgridvit_tpu.data.transforms import _NUM_BINS, _ra_space

# op ids follow the host-space dict order (data/transforms.py:_ra_space)
_OP_NAMES = (
    "Identity", "ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate",
    "Brightness", "Color", "Contrast", "Sharpness", "Posterize", "Solarize",
    "AutoContrast", "Equalize",
)
_GEO_OPS = ("ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate")


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Everything the device needs to run the train recipe on raw uint8."""

    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]
    crop_pad: int
    ra_num_ops: int = 2
    ra_magnitude: int = 7
    random_erasing_p: float = 0.25
    hflip_p: float = 0.5
    enable_augs: bool = True


# ------------------------------------------------------------- crop / flip

def _crop_matrix(key, B: int, padding: int):
    """RandomCrop(pad) as an exact affine translate with zero fill:
    out[y, x] = img[y + top - p, x + left - p] (pad+slice equivalence)."""
    kt, kl = jax.random.split(key)
    top = jax.random.randint(kt, (B,), 0, 2 * padding + 1).astype(jnp.float32)
    left = jax.random.randint(kl, (B,), 0, 2 * padding + 1).astype(jnp.float32)
    one = jnp.ones((B,), jnp.float32)
    zero = jnp.zeros((B,), jnp.float32)
    return jnp.stack([one, zero, left - padding, zero, one, top - padding], 1)


def _flip_matrix(key, B: int, W: int, p: float):
    """Horizontal flip as an exact affine (a=-1, c=W: floor(W-x-0.5)=W-1-x),
    identity for the non-flipped images."""
    flip = jax.random.uniform(key, (B,)) < p
    one = jnp.ones((B,), jnp.float32)
    zero = jnp.zeros((B,), jnp.float32)
    a = jnp.where(flip, -1.0, 1.0)
    c = jnp.where(flip, float(W), 0.0)
    return jnp.stack([a, zero, c, zero, one, zero], 1)


def _compose_affine(inner, outer):
    """warp(warp(x, inner), outer) == warp(x, compose(inner, outer)):
    coords_in = inner(outer(coords_out)). Exact for the integer maps used
    here (translate/flip keep half-integer centers on half-integers)."""
    a1, b1, c1, d1, e1, f1 = (inner[:, i] for i in range(6))
    a2, b2, c2, d2, e2, f2 = (outer[:, i] for i in range(6))
    return jnp.stack([
        a1 * a2 + b1 * d2, a1 * b2 + b1 * e2, a1 * c2 + b1 * f2 + c1,
        d1 * a2 + e1 * d2, d1 * b2 + e1 * e2, d1 * c2 + e1 * f2 + f1,
    ], 1)


def random_crop_batch(key, x, padding: int):
    """Zero-pad by ``padding`` and crop back at a per-image random offset
    (host twin: transforms.random_crop)."""
    return _affine_warp_nearest(x, _crop_matrix(key, x.shape[0], padding))


def random_hflip_batch(key, x, p: float = 0.5):
    flip = jax.random.uniform(key, (x.shape[0],)) < p
    return jnp.where(flip[:, None, None, None], x[:, :, ::-1], x)


# ------------------------------------------------------------- geometric

def _fix16(v):
    """PIL's FIX macro: C cast (truncate toward zero) of v*65536 + 0.5."""
    return jnp.trunc(v * 65536.0 + 0.5).astype(jnp.int32)


def _affine_warp_nearest(x, mat):
    """x: [B,H,W,C] int32; mat: [B,6] output->input (a,b,c,d,e,f) as PIL
    AFFINE, NEAREST, zero fill.

    Bit-exact with PIL's fast path (Geometry.c affine transform): 16.16
    fixed-point coordinates, per-row start = FIX(c + a*0.5 + b*(y+0.5)),
    stepping by FIX(a) per output x, pixel = coord >> 16. The fixed-point
    integers are exact; only the FIX() of the row starts is float (f32 here
    vs PIL's double), so mismatches need a coordinate within ~1/65536 px of
    a pixel boundary — measure-zero for random magnitudes."""
    B, H, W, C = x.shape
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    a, b, c, d, e, f = (mat[:, i] for i in range(6))
    row_xx = _fix16(c[:, None] + a[:, None] * 0.5 + b[:, None] * ys[None, :])
    row_yy = _fix16(f[:, None] + d[:, None] * 0.5 + e[:, None] * ys[None, :])
    dx = _fix16(a)[:, None, None]
    dy = _fix16(d)[:, None, None]
    xs = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    xi = (row_xx[:, :, None] + dx * xs) >> 16  # [B,H,W]
    yi = (row_yy[:, :, None] + dy * xs) >> 16

    # TPU-friendly gather: per-pixel dynamic gathers serialize on TPU, so the
    # lookup is factored into two one-hot contractions that ride the MXU/VPU
    # (exact: each one-hot row has at most a single 1; out-of-range coords
    # give all-zero rows, which IS the zero fill). Working set stays
    # O(B*HW*max(H,W)) — no [HW, HW] matrix.
    row_oh = (yi.reshape(B, H * W)[:, :, None]
              == jnp.arange(H)[None, None, :]).astype(jnp.bfloat16)
    col_oh = (xi.reshape(B, H * W)[:, :, None]
              == jnp.arange(W)[None, None, :]).astype(jnp.bfloat16)
    # g[b,o,w,c] = x[b, yi[o], w, c]; pixel values <=255 are exact in bf16,
    # so the [B,HW,W,C] intermediate stays half-width
    g = jnp.einsum("bor,brwc->bowc", row_oh,
                   x.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    out = jnp.einsum("bowc,bow->boc", g, col_oh,
                     preferred_element_type=jnp.float32)
    # uint8 values (<=255) are exact in bf16/f32; round defensively
    return jnp.round(out).astype(x.dtype).reshape(B, H, W, C)


def _geo_matrices(op_id, v, H: int, W: int, name_to_id):
    """Per-image affine matrix: the selected geometric op's matrix, identity
    for color/identity ops. op_id: [B] int32, v: [B] signed magnitude."""
    B = op_id.shape[0]
    one = jnp.ones((B,), jnp.float32)
    zero = jnp.zeros((B,), jnp.float32)
    ident = jnp.stack([one, zero, zero, zero, one, zero], axis=1)

    def pick(name, m):
        return jnp.where((op_id == name_to_id[name])[:, None], m, ident)

    mat = ident
    mat = jnp.where((op_id == name_to_id["ShearX"])[:, None],
                    jnp.stack([one, v, zero, zero, one, zero], 1), mat)
    mat = jnp.where((op_id == name_to_id["ShearY"])[:, None],
                    jnp.stack([one, zero, zero, v, one, zero], 1), mat)
    mat = jnp.where((op_id == name_to_id["TranslateX"])[:, None],
                    jnp.stack([one, zero, v, zero, one, zero], 1), mat)
    mat = jnp.where((op_id == name_to_id["TranslateY"])[:, None],
                    jnp.stack([one, zero, zero, zero, one, v], 1), mat)
    ang = v * (math.pi / 180.0)
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    cx, cy = W / 2.0, H / 2.0
    rot = jnp.stack([ca, -sa, cx - ca * cx + sa * cy,
                     sa, ca, cy - sa * cx - ca * cy], 1)
    mat = jnp.where((op_id == name_to_id["Rotate"])[:, None], rot, mat)
    return mat


# ------------------------------------------------------------- color ops

def _gray_l(x):
    """PIL convert('L'): (19595 R + 38470 G + 7471 B + 0x8000) >> 16."""
    v = (x[..., 0] * 19595 + x[..., 1] * 38470 + x[..., 2] * 7471 + 0x8000)
    return v >> 16  # int32 [B,H,W]


def _blend_trunc(degenerate, x, f):
    """PIL ImageEnhance blend: floor(deg + f*(x-deg)) clipped to [0,255].
    f: [B]."""
    a = degenerate + f[:, None, None, None] * (x.astype(jnp.float32) - degenerate)
    return jnp.clip(jnp.floor(a), 0, 255).astype(jnp.int32)


def _brightness(x, f):
    return jnp.clip(jnp.floor(x.astype(jnp.float32) * f[:, None, None, None]),
                    0, 255).astype(jnp.int32)


def _color(x, f):
    gray = _gray_l(x)[..., None].astype(jnp.float32)
    return _blend_trunc(gray, x, f)


def _contrast(x, f):
    gray = _gray_l(x)
    mean = jnp.floor(gray.astype(jnp.float32).mean(axis=(1, 2)) + 0.5)
    return _blend_trunc(mean[:, None, None, None], x, f)


def _sharpness(x, f):
    B, H, W, C = x.shape
    k = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    sm = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        jnp.broadcast_to(k[:, :, None, None], (3, 3, 1, C)),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    sm = jnp.clip(jnp.round(sm), 0, 255)
    # PIL's filtered degenerate keeps the original 1px border
    ri = jnp.arange(H)[None, :, None, None]
    ci = jnp.arange(W)[None, None, :, None]
    border = (ri == 0) | (ri == H - 1) | (ci == 0) | (ci == W - 1)
    sm = jnp.where(border, x.astype(jnp.float32), sm)
    return _blend_trunc(sm, x, f)


def _posterize(x, bits):
    # bits: [B] int32; mask = 0xFF << (8-bits) (kept to 8 bits)
    mask = jnp.bitwise_and(
        jnp.left_shift(jnp.int32(0xFF), 8 - bits), 0xFF)[:, None, None, None]
    return jnp.bitwise_and(x, mask)


def _solarize(x, thresh):
    t = thresh[:, None, None, None]
    return jnp.where(x < t, x, 255 - x)


def _autocontrast(x):
    """PIL's lut = int(i*scale + offset) == (i - lo)*255 // (hi - lo) for
    in-range pixels (exact integer math — float would 1-off at the exact
    multiples, e.g. px == hi)."""
    lo = x.min(axis=(1, 2), keepdims=True)
    hi = x.max(axis=(1, 2), keepdims=True)
    num = (x - lo) * 255
    out = jnp.clip(num // jnp.maximum(hi - lo, 1), 0, 255)
    return jnp.where(hi > lo, out, x)


def _equalize(x):
    """PIL ImageOps.equalize integer lut per channel.

    No dynamic gathers (they serialize on TPU) and no 256-wide one-hot
    either (a [B,C,HW,256] intermediate is ~200 MB at bs128 and was ~1 ms
    of the train step): the 8-bit pixel value factors into two nibbles, so
    BOTH the histogram and the lut application decompose over two 16-wide
    one-hots — exact (every sum has at most one nonzero per reduced index,
    accumulated in fp32) at ~8x less HBM traffic:

      hist[vh,vl] = sum_p oh_hi[p,vh] * oh_lo[p,vl]        (one matmul)
      out[p]      = sum_vh oh_hi[p,vh] * (lut2 @ oh_lo)[p,vh]
    """
    B, H, W, C = x.shape
    px = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, C, H * W)  # int32
    oh_hi = ((px >> 4)[:, :, :, None]
             == jnp.arange(16)[None, None, None, :]).astype(jnp.bfloat16)
    oh_lo = ((px & 15)[:, :, :, None]
             == jnp.arange(16)[None, None, None, :]).astype(jnp.bfloat16)
    hist = jnp.einsum("bcph,bcpl->bchl", oh_hi, oh_lo,
                      preferred_element_type=jnp.float32)
    hist = jnp.round(hist).astype(jnp.int32).reshape(B, C, 256)
    nnz = (hist > 0).sum(axis=-1)  # [B,C]
    # hist value at the LAST nonzero bin, again without a gather
    last_nz_idx = 255 - jnp.argmax((hist > 0)[:, :, ::-1], axis=-1)
    last_nz = jnp.sum(
        jnp.where(jnp.arange(256)[None, None, :] == last_nz_idx[:, :, None],
                  hist, 0), axis=-1)
    step = (hist.sum(axis=-1) - last_nz) // 255  # [B,C]
    cum = jnp.cumsum(hist, axis=-1) - hist  # sum_{j<i} h[j]
    stp = jnp.maximum(step, 1)[:, :, None]
    lut = jnp.clip((step[:, :, None] // 2 + cum) // stp, 0, 255)
    lut2 = lut.reshape(B, C, 16, 16).astype(jnp.bfloat16)  # ints <=255 exact
    tmp = jnp.einsum("bcpl,bchl->bcph", oh_lo, lut2,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("bcph,bcph->bcp", oh_hi.astype(jnp.float32), tmp)
    out = jnp.round(out).astype(x.dtype)
    identity = (nnz <= 1) | (step == 0)
    out = jnp.where(identity[:, :, None], px, out)
    return jnp.transpose(out.reshape(B, C, H, W), (0, 2, 3, 1))


# ------------------------------------------------------------- RandAugment

def _ra_tables(image_size: int, magnitude: int):
    """Static per-op magnitude at the chosen bin (host _ra_space is the
    single source of truth)."""
    space = _ra_space(_NUM_BINS, image_size)
    mags, signed = [], []
    for name in _OP_NAMES:
        m, s = space[name]
        mags.append(float(m[magnitude]) if m is not None else 0.0)
        signed.append(bool(s))
    return np.asarray(mags, np.float32), np.asarray(signed, np.bool_)


def rand_augment_apply(x, op_ids, signs, magnitude: int = 7):
    """Deterministic RandAugment given concrete draws: ``op_ids``
    [num_ops, B] int32 into the 14-op space, ``signs`` [num_ops, B] in
    {-1., +1.} (consumed only by signed ops)."""
    B, H, W, C = x.shape
    mags, signed = _ra_tables(W, magnitude)
    mags = jnp.asarray(mags)
    signed = jnp.asarray(signed)
    name_to_id = {n: i for i, n in enumerate(_OP_NAMES)}

    for s in range(op_ids.shape[0]):
        op_id = op_ids[s]
        sign = signs[s]
        v = mags[op_id] * jnp.where(signed[op_id], sign, 1.0)

        # one warp handles all geometric ops (identity matrix otherwise)
        mat = _geo_matrices(op_id, v, H, W, name_to_id)
        x = _affine_warp_nearest(x, mat)

        # color ops: compute candidates, select per image
        f = 1.0 + v
        for name, out in (
            ("Brightness", lambda: _brightness(x, f)),
            ("Color", lambda: _color(x, f)),
            ("Contrast", lambda: _contrast(x, f)),
            ("Sharpness", lambda: _sharpness(x, f)),
            ("Posterize", lambda: _posterize(x, v.astype(jnp.int32))),
            ("Solarize", lambda: _solarize(x, v.astype(jnp.int32))),
            ("AutoContrast", lambda: _autocontrast(x)),
            ("Equalize", lambda: _equalize(x)),
        ):
            x = jnp.where((op_id == name_to_id[name])[:, None, None, None],
                          out(), x)
    return x


def rand_augment_batch(key, x, num_ops: int = 2, magnitude: int = 7):
    """x: [B,H,W,C] int32 in [0,255] -> same. Applies ``num_ops`` sequential
    ops, each sampled per image uniformly from the 14-op space."""
    B = x.shape[0]
    op_ids, signs = [], []
    for s in range(num_ops):
        key, k_op, k_sign = jax.random.split(key, 3)
        op_ids.append(jax.random.randint(k_op, (B,), 0, len(_OP_NAMES)))
        signs.append(jnp.where(jax.random.uniform(k_sign, (B,)) < 0.5,
                               -1.0, 1.0))
    return rand_augment_apply(x, jnp.stack(op_ids), jnp.stack(signs),
                              magnitude)


# ------------------------------------------------------------- normalize / erase

def normalize_batch(x, mean: Sequence[float], std: Sequence[float]):
    """uint8/int -> normalized float32 (host twin: transforms.normalize)."""
    xf = x.astype(jnp.float32) / 255.0
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return (xf - m) / s


def random_erasing_batch(
    key, x,
    p: float = 0.25,
    scale: Tuple[float, float] = (0.02, 0.20),
    ratio: Tuple[float, float] = (0.3, 3.3),
    tries: int = 10,
):
    """RandomErasing(value='random') on normalized float images: per image,
    up to ``tries`` candidate boxes, first valid one filled with N(0,1)."""
    B, H, W, C = x.shape
    kp, ka, kr, kt, kl, kn = jax.random.split(key, 6)
    apply = jax.random.uniform(kp, (B,)) < p
    area = jax.random.uniform(ka, (B, tries), minval=scale[0],
                              maxval=scale[1]) * (H * W)
    aspect = jnp.exp(jax.random.uniform(
        kr, (B, tries), minval=math.log(ratio[0]), maxval=math.log(ratio[1])))
    eh = jnp.round(jnp.sqrt(area * aspect)).astype(jnp.int32)
    ew = jnp.round(jnp.sqrt(area / aspect)).astype(jnp.int32)
    valid = (eh > 0) & (eh < H) & (ew > 0) & (ew < W)
    pick = jnp.argmax(valid, axis=1)  # first valid try
    any_valid = valid.any(axis=1)
    eh = jnp.take_along_axis(eh, pick[:, None], 1)[:, 0]
    ew = jnp.take_along_axis(ew, pick[:, None], 1)[:, 0]
    top = jnp.floor(jax.random.uniform(kt, (B,))
                    * (H - eh + 1).astype(jnp.float32)).astype(jnp.int32)
    left = jnp.floor(jax.random.uniform(kl, (B,))
                     * (W - ew + 1).astype(jnp.float32)).astype(jnp.int32)
    ri = jnp.arange(H)[None, :, None]
    ci = jnp.arange(W)[None, None, :]
    inside = ((ri >= top[:, None, None]) & (ri < (top + eh)[:, None, None])
              & (ci >= left[:, None, None]) & (ci < (left + ew)[:, None, None]))
    inside = inside & (apply & any_valid)[:, None, None]
    noise = jax.random.normal(kn, x.shape, x.dtype)
    return jnp.where(inside[..., None], noise, x)


# ------------------------------------------------------------- full recipe

class AugmentDraws(NamedTuple):
    """Concrete per-image randomness for one train batch, separated from
    application so a host replay (PIL ops fed the SAME draws) can check the
    full composed recipe, not just each op (mirrors mixing.sample_mix_draws).
    Fields are None when the corresponding stage is disabled."""

    crop_top: jnp.ndarray | None     # [B] f32 in [0, 2*pad]
    crop_left: jnp.ndarray | None    # [B] f32
    flip: jnp.ndarray | None         # [B] bool
    op_ids: jnp.ndarray | None       # [num_ops, B] i32 into the 14-op space
    signs: jnp.ndarray | None        # [num_ops, B] f32 in {-1., +1.}
    er_apply: jnp.ndarray | None     # [B] bool (p-gate AND a valid box)
    er_top: jnp.ndarray | None       # [B] i32
    er_left: jnp.ndarray | None      # [B] i32
    er_h: jnp.ndarray | None         # [B] i32
    er_w: jnp.ndarray | None         # [B] i32
    er_noise: jnp.ndarray | None     # [B,H,W,C] f32 N(0,1)


def sample_augment_draws(
    key, shape: Tuple[int, int, int, int], cfg: AugmentConfig,
    *,
    erase_scale: Tuple[float, float] = (0.02, 0.20),
    erase_ratio: Tuple[float, float] = (0.3, 3.3),
    erase_tries: int = 10,
) -> AugmentDraws:
    """Draw every random quantity of the train recipe; key-split order is
    bit-identical to the fused `augment_train_batch` path."""
    B, H, W, C = shape
    none = AugmentDraws(*([None] * 11))
    if not cfg.enable_augs:
        return none
    k_crop, k_flip, k_ra, k_er = jax.random.split(key, 4)
    kt, kl = jax.random.split(k_crop)
    top = jax.random.randint(
        kt, (B,), 0, 2 * cfg.crop_pad + 1).astype(jnp.float32)
    left = jax.random.randint(
        kl, (B,), 0, 2 * cfg.crop_pad + 1).astype(jnp.float32)
    flip = jax.random.uniform(k_flip, (B,)) < cfg.hflip_p
    op_ids = signs = None
    if cfg.ra_num_ops > 0:
        ids, sgn, k = [], [], k_ra
        for _ in range(cfg.ra_num_ops):
            k, k_op, k_sign = jax.random.split(k, 3)
            ids.append(jax.random.randint(k_op, (B,), 0, len(_OP_NAMES)))
            sgn.append(jnp.where(
                jax.random.uniform(k_sign, (B,)) < 0.5, -1.0, 1.0))
        op_ids, signs = jnp.stack(ids), jnp.stack(sgn)
    draws = none._replace(crop_top=top, crop_left=left, flip=flip,
                          op_ids=op_ids, signs=signs)
    if cfg.random_erasing_p > 0:
        kp, ka, kr, kt2, kl2, kn = jax.random.split(k_er, 6)
        apply = jax.random.uniform(kp, (B,)) < cfg.random_erasing_p
        area = jax.random.uniform(
            ka, (B, erase_tries), minval=erase_scale[0],
            maxval=erase_scale[1]) * (H * W)
        aspect = jnp.exp(jax.random.uniform(
            kr, (B, erase_tries), minval=math.log(erase_ratio[0]),
            maxval=math.log(erase_ratio[1])))
        eh = jnp.round(jnp.sqrt(area * aspect)).astype(jnp.int32)
        ew = jnp.round(jnp.sqrt(area / aspect)).astype(jnp.int32)
        valid = (eh > 0) & (eh < H) & (ew > 0) & (ew < W)
        pick = jnp.argmax(valid, axis=1)
        any_valid = valid.any(axis=1)
        eh = jnp.take_along_axis(eh, pick[:, None], 1)[:, 0]
        ew = jnp.take_along_axis(ew, pick[:, None], 1)[:, 0]
        er_top = jnp.floor(jax.random.uniform(kt2, (B,))
                           * (H - eh + 1).astype(jnp.float32)).astype(jnp.int32)
        er_left = jnp.floor(jax.random.uniform(kl2, (B,))
                            * (W - ew + 1).astype(jnp.float32)).astype(jnp.int32)
        noise = jax.random.normal(kn, (B, H, W, C), jnp.float32)
        draws = draws._replace(er_apply=apply & any_valid, er_top=er_top,
                               er_left=er_left, er_h=eh, er_w=ew,
                               er_noise=noise)
    return draws


def apply_augment_draws(images_u8, draws: AugmentDraws, cfg: AugmentConfig):
    """Deterministic application of the train recipe given concrete draws."""
    x = images_u8.astype(jnp.int32)
    B, H, W, _ = x.shape
    if cfg.enable_augs:
        one = jnp.ones((B,), jnp.float32)
        zero = jnp.zeros((B,), jnp.float32)
        p = float(cfg.crop_pad)
        crop_m = jnp.stack([one, zero, draws.crop_left - p,
                            zero, one, draws.crop_top - p], 1)
        a = jnp.where(draws.flip, -1.0, 1.0)
        c = jnp.where(draws.flip, float(W), 0.0)
        flip_m = jnp.stack([a, zero, c, zero, one, zero], 1)
        # crop-then-flip as ONE composed warp (both are exact integer maps)
        x = _affine_warp_nearest(x, _compose_affine(crop_m, flip_m))
        if cfg.ra_num_ops > 0:
            x = rand_augment_apply(x, draws.op_ids, draws.signs,
                                   cfg.ra_magnitude)
    xf = normalize_batch(x, cfg.mean, cfg.std)
    if cfg.enable_augs and cfg.random_erasing_p > 0:
        ri = jnp.arange(H)[None, :, None]
        ci = jnp.arange(W)[None, None, :]
        top, left = draws.er_top, draws.er_left
        inside = ((ri >= top[:, None, None])
                  & (ri < (top + draws.er_h)[:, None, None])
                  & (ci >= left[:, None, None])
                  & (ci < (left + draws.er_w)[:, None, None]))
        inside = inside & draws.er_apply[:, None, None]
        xf = jnp.where(inside[..., None], draws.er_noise, xf)
    return xf


def augment_train_batch(key, images_u8, cfg: AugmentConfig):
    """The full train recipe on device: raw uint8 NHWC -> normalized float32.
    Mirrors data/transforms.TrainTransform (resize, when needed, stays on
    host — it's cheap and cacheable)."""
    draws = sample_augment_draws(key, images_u8.shape, cfg)
    return apply_augment_draws(images_u8, draws, cfg)
