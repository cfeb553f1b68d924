#!/usr/bin/env python
"""Benchmark the train step for ANY config YAML, sweeping batch sizes.

Measures the same configuration as the canonical `bench.py` (raw uint8 +
in-jit augmentation + mixup/cutmix + fwd/bwd + AdamW + metrics, K steps
scanned per dispatch) but parameterized on config file, image size and a
list of batch sizes, all in one process so each shape compiles once.

Usage:
  python scripts/bench_config.py --config configs/tinyimagenet200_model_a.yaml \
      --batch 64 128 256 --k 8 --steps 96
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

# dataset normalization stats + crop pad rules (reference recipe,
# `load_cifrar100.py:39-44`, `load_tinyimagenet.py:103`, `load_svhn.py:64`)
STATS = {
    "cifar100": ((0.5071, 0.4867, 0.4408), (0.2675, 0.2565, 0.2761)),
    "svhn": ((0.4377, 0.4438, 0.4728), (0.1980, 0.2010, 0.1970)),
    "tinyimagenet200": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--batch", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--steps", type=int, default=96,
                    help="measured single steps per batch size")
    ap.add_argument("--img-size", type=int, default=None)
    ap.add_argument("--no-augment", action="store_true")
    args = ap.parse_args()

    import yaml
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("OUTGRIDVIT_JAX_CACHE", "/tmp/outgridvit_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from outgridvit_tpu.models import build_model
    from outgridvit_tpu.ops.augment import AugmentConfig
    from outgridvit_tpu.parallel import (
        make_mesh,
        shard_train_state,
        superbatch_sharding,
        batch_sharding,
    )
    from outgridvit_tpu.training.optim import make_optimizer, warmup_cosine_lr
    from outgridvit_tpu.training.steps import (
        StepConfig,
        make_train_step,
        make_train_superstep,
    )
    from outgridvit_tpu.training.train_state import TrainState

    cfg = yaml.safe_load((ROOT / args.config).read_text()
                         if not os.path.isabs(args.config)
                         else Path(args.config).read_text())
    data_cfg = cfg.get("data", {})
    tcfg = cfg["training"]
    img = args.img_size or int(data_cfg.get("img_size", 32))
    dataset = data_cfg.get("dataset", "cifar100")
    mean, std = STATS.get(dataset, STATS["cifar100"])
    crop_pad = max(8, img // 8) if dataset.startswith("tiny") else max(
        4, img // 8)
    num_classes = int(cfg["model"]["num_classes"])

    model = build_model(cfg["model"], dtype=jnp.bfloat16)
    mesh = make_mesh()

    schedule = warmup_cosine_lr(float(tcfg["lr"]), 10_000, 500,
                                float(tcfg["min_lr"]))
    tx = make_optimizer(schedule, float(tcfg["weight_decay"]),
                        tcfg.get("grad_clip_norm", 1.0))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1), jnp.zeros((2, img, img, 3), jnp.float32))

    aug = None if args.no_augment else AugmentConfig(
        mean=mean, std=std, crop_pad=crop_pad,
        ra_num_ops=int(data_cfg.get("ra_num_ops", 2)),
        ra_magnitude=int(data_cfg.get("ra_magnitude", 7)),
        random_erasing_p=float(data_cfg.get("random_erasing_p", 0.25)))
    step_cfg = StepConfig(
        num_classes=num_classes,
        label_smoothing=float(tcfg.get("label_smoothing", 0.1)),
        mixup_alpha=float(tcfg.get("mixup_alpha", 0.8)),
        cutmix_alpha=float(tcfg.get("cutmix_alpha", 1.0)),
        mix_prob=float(tcfg.get("mix_prob", 0.5)),
        grad_clip_norm=tcfg.get("grad_clip_norm", 1.0),
        augment=aug,
    )
    k = max(1, args.k)
    if k > 1:
        step_fn = make_train_superstep(step_cfg, lr_schedule=schedule)
        bshard = superbatch_sharding(mesh)
    else:
        step_fn = make_train_step(step_cfg, lr_schedule=schedule)
        bshard = batch_sharding(mesh)

    rng = jax.random.PRNGKey(0)
    results = {}
    for bs in args.batch:
        # fresh buffers each size: the step donates the state, deleting the
        # previous iteration's param arrays (shared with `variables`)
        fresh = jax.tree_util.tree_map(jnp.array, variables)
        state = TrainState.create(
            apply_fn=model.apply, params=fresh["params"],
            batch_stats=fresh.get("batch_stats", {}), tx=tx)
        state = shard_train_state(state, mesh)
        bshape = (k, bs) if k > 1 else (bs,)
        batches = []
        for i in range(4):
            kx = jax.random.fold_in(rng, i)
            if aug is not None:
                xb = jax.random.randint(kx, bshape + (img, img, 3), 0, 255,
                                        dtype=jnp.int32).astype(jnp.uint8)
            else:
                xb = jax.random.normal(kx, bshape + (img, img, 3),
                                       jnp.float32)
            yb = jax.random.randint(jax.random.fold_in(rng, 100 + i), bshape,
                                    0, num_classes)
            batches.append((jax.device_put(xb, bshard),
                            jax.device_put(yb, bshard)))

        def hard_sync(state, m):
            jax.device_get(m["loss"])
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[0]

        base = jax.random.PRNGKey(2)
        n_disp = max(1, args.steps // k)
        t0 = time.perf_counter()
        try:
            for i in range(max(1, 16 // k)):
                state, m = step_fn(state, batches[i % 4], base)
            hard_sync(state, m)
        except Exception as e:  # noqa: BLE001 — report per-bs OOM and move on
            print(f"[bench_config] bs={bs} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
            results[bs] = None
            continue
        print(f"[bench_config] bs={bs} warmup+compile "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        t0 = time.perf_counter()
        for i in range(n_disp):
            state, m = step_fn(state, batches[i % 4], base)
        hard_sync(state, m)
        dt = time.perf_counter() - t0
        rate = bs * k * n_disp / dt
        results[bs] = round(rate, 1)
        print(f"[bench_config] bs={bs}: {rate:.1f} imgs/s "
              f"({1000 * dt / (k * n_disp):.2f} ms/step)", file=sys.stderr)

    print(json.dumps({"config": args.config, "img_size": img, "k": k,
                      "imgs_per_sec": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
