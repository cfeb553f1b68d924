"""Inference / serving surface (beyond the reference, which ships no
deployment story — `/root/reference/README.md` ends at training +
analysis).

Two layers:

- :func:`build_predictor` — a jitted fixed-batch classifier closure over a
  trained checkpoint: raw uint8 NHWC in (the production wire format,
  normalization in-jit), ``(labels, probs)`` out. Ragged final batches are
  zero-padded to the compiled batch size so ONE compiled program serves
  any request size up to ``batch_size`` (dynamic shapes would recompile
  per size — XLA programs are shape-specialized).
- :func:`export_predictor` / :func:`load_predictor` — ahead-of-time
  serialization via ``jax.export`` (StableHLO): the artifact runs without
  the model code or checkpoint present, pinned to the lowering platform.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional, Sequence, Tuple

import numpy as np


@dataclass(frozen=True)
class Predictor:
    """A compiled fixed-batch classifier.

    ``fn``: jitted ``uint8 [batch_size, H, W, 3] -> (int32 [batch_size],
    float32 [batch_size, num_classes])`` (argmax labels, softmax probs).
    ``predict`` accepts 1..batch_size images and strips the padding.
    """

    fn: Callable
    batch_size: int
    img_size: int
    num_classes: int

    def predict(self, images: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        import jax

        images = np.asarray(images)
        if not np.issubdtype(images.dtype, np.integer):
            raise ValueError(
                f"images must be raw uint8 pixels (got {images.dtype}); "
                "normalization happens in-jit — pre-normalized floats "
                "would truncate to zeros")
        if images.ndim == 3:
            images = images[None]
        n = images.shape[0]
        if n > self.batch_size:
            raise ValueError(
                f"got {n} images > compiled batch size {self.batch_size}; "
                f"chunk the request or build with a larger batch_size")
        if images.shape[1:3] != (self.img_size, self.img_size):
            raise ValueError(
                f"expected {self.img_size}x{self.img_size} images, got "
                f"{images.shape[1:3]}")
        if n < self.batch_size:
            pad = np.zeros((self.batch_size - n,) + images.shape[1:],
                           dtype=images.dtype)
            images = np.concatenate([images, pad], axis=0)
        labels, probs = self.fn(images.astype(np.uint8))
        labels, probs = jax.device_get((labels, probs))
        return np.asarray(labels)[:n], np.asarray(probs)[:n]

    def predict_many(self, images: np.ndarray) -> Tuple[np.ndarray,
                                                        np.ndarray]:
        """Arbitrary request size: full chunks are dispatched back to back
        (device queue overlaps transfer with compute); the ragged tail is
        padded like :meth:`predict`."""
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        out_l, out_p = [], []
        for i in range(0, len(images), self.batch_size):
            lab, prob = self.predict(images[i:i + self.batch_size])
            out_l.append(lab)
            out_p.append(prob)
        return np.concatenate(out_l), np.concatenate(out_p)


def build_predictor(
    model_cfg: dict,
    variables: Optional[dict] = None,
    checkpoint: Optional[str] = None,
    batch_size: int = 64,
    img_size: int = 32,
    mean: Sequence[float] = (0.5071, 0.4867, 0.4408),
    std: Sequence[float] = (0.2675, 0.2565, 0.2761),
    dtype=None,
    mesh=None,
    use_pallas=None,
) -> Predictor:
    """Build a jitted predictor from a model config and either live
    ``variables`` or a ``checkpoint`` path (msgpack, as written by the
    trainer; eval-only restore via ``load_model_variables``).

    ``mesh``: a ``jax.sharding.Mesh`` with a ``data`` axis shards the
    request batch over devices (``batch_size`` must divide by the data
    axis); GSPMD handles the rest — serving scales the same way training
    does.

    ``use_pallas=False`` builds the portable XLA-only compute path —
    REQUIRED when exporting for a platform other than the current backend
    (Pallas custom calls traced on TPU cannot lower for cpu)."""
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.models import build_model
    from outgridvit_tpu.ops.augment import normalize_batch

    if variables is not None and checkpoint:
        raise ValueError(
            "pass either live variables or a checkpoint path, not both "
            "(the checkpoint would be silently ignored)")
    dtype = dtype or jnp.bfloat16
    model = build_model(model_cfg, dtype=dtype, use_pallas=use_pallas)
    if variables is None:
        x0 = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
        if checkpoint:
            from outgridvit_tpu.training.checkpoints import (
                load_model_variables,
            )

            variables = load_model_variables(checkpoint, dict(variables))
    num_classes = int(model_cfg.get("num_classes", 100))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def infer(images):
        x = normalize_batch(images, tuple(mean), tuple(std))
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.argmax(probs, axis=-1).astype(jnp.int32), probs

    if mesh is not None:
        from outgridvit_tpu.parallel import batch_sharding

        shard = batch_sharding(mesh)
        if batch_size % mesh.shape["data"] != 0:
            raise ValueError(
                f"batch_size {batch_size} must divide over the data axis "
                f"({mesh.shape['data']} devices)")
        jitted = jax.jit(infer, in_shardings=shard,
                         out_shardings=(shard, shard))
    else:
        jitted = jax.jit(infer)
    return Predictor(fn=jitted, batch_size=batch_size,
                     img_size=img_size, num_classes=num_classes)


def export_predictor(predictor: Predictor, path: str,
                     platforms: Optional[Sequence[str]] = None) -> None:
    """Serialize the predictor's compiled computation (StableHLO via
    ``jax.export``) — weights baked in, loadable without the model code."""
    import jax
    from jax import export as jexport

    spec = jax.ShapeDtypeStruct(
        (predictor.batch_size, predictor.img_size, predictor.img_size, 3),
        np.uint8)
    exp = jexport.export(
        jax.jit(predictor.fn),
        platforms=list(platforms) if platforms else None)(spec)
    blob = exp.serialize()
    meta = np.array([predictor.batch_size, predictor.img_size,
                     predictor.num_classes], dtype=np.int64)
    out = Path(path)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "wb") as f:
        f.write(b"OGVT1")
        f.write(meta.tobytes())
        f.write(blob)


def load_predictor(path: str) -> Predictor:
    """Load an :func:`export_predictor` artifact; the returned Predictor
    calls the deserialized computation (no model code / checkpoint
    needed)."""
    from jax import export as jexport

    raw = Path(path).read_bytes()
    if raw[:5] != b"OGVT1":
        raise ValueError(f"{path} is not an OutGridViT predictor artifact")
    meta = np.frombuffer(raw[5:5 + 24], dtype=np.int64)
    exp = jexport.deserialize(bytearray(raw[5 + 24:]))
    return Predictor(fn=exp.call, batch_size=int(meta[0]),
                     img_size=int(meta[1]), num_classes=int(meta[2]))
