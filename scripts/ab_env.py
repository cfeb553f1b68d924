#!/usr/bin/env python
"""Same-process alternating A/B of the full train step under an env toggle.

The dev TPU is reached over a tunnel whose effective throughput drifts
between measurement windows (docs/PERFORMANCE.md "Measurement
methodology"), so two separate-process runs of `bench_config.py` can
disagree by more than the effect being measured. This harness removes the
window problem: it builds TWO jitted step functions in ONE process — one
traced with the env var unset, one with it set (kernel dispatch in
`models/layers.py` reads the env at trace time) — then interleaves short
timed legs A,B,A,B,... on the same device-resident data and reports
per-leg rates plus medians.

Usage:
  python scripts/ab_env.py --config configs/tinyimagenet200_model_a.yaml \
      --env OUTGRIDVIT_DW_BWD=1 --batch 128 --k 8 --legs 6 --steps 48
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from scripts.bench_config import STATS  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--env", required=True,
                    help="KEY=VAL set only for the B-side trace")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--legs", type=int, default=6,
                    help="timed legs PER SIDE, interleaved A,B,A,B,...")
    ap.add_argument("--steps", type=int, default=48,
                    help="single steps per leg")
    ap.add_argument("--img-size", type=int, default=None)
    args = ap.parse_args()
    key, _, val = args.env.partition("=")
    if not val:
        ap.error("--env must be KEY=VAL")

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

    aug = AugmentConfig(
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
    bs = args.batch
    bshard = superbatch_sharding(mesh) if k > 1 else batch_sharding(mesh)
    bshape = (k, bs) if k > 1 else (bs,)

    rng = jax.random.PRNGKey(0)
    batches = []
    for i in range(4):
        kx = jax.random.fold_in(rng, i)
        xb = jax.random.randint(kx, bshape + (img, img, 3), 0, 255,
                                dtype=jnp.int32).astype(jnp.uint8)
        yb = jax.random.randint(jax.random.fold_in(rng, 100 + i), bshape,
                                0, num_classes)
        batches.append((jax.device_put(xb, bshard),
                        jax.device_put(yb, bshard)))

    # Two independently-jitted step functions; kernel dispatch reads the
    # env var at TRACE time, i.e. during each side's first (warmup) call —
    # the env is toggled around that call below, after which each side's
    # compiled program is fixed for the timed legs.
    def make():
        return (make_train_superstep(step_cfg, lr_schedule=schedule)
                if k > 1 else
                make_train_step(step_cfg, lr_schedule=schedule))

    sides = {"A": make(), "B": make()}
    side_env = {"A": None, "B": val}

    def fresh_state():
        f = jax.tree_util.tree_map(jnp.array, variables)
        st = TrainState.create(apply_fn=model.apply, params=f["params"],
                               batch_stats=f.get("batch_stats", {}), tx=tx)
        return shard_train_state(st, mesh)

    states = {name: fresh_state() for name in sides}

    def hard_sync(state, m):
        jax.device_get(m["loss"])
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[0]

    base = jax.random.PRNGKey(2)
    n_disp = max(1, args.steps // k)
    for name in ("A", "B"):
        saved = os.environ.get(key)
        if side_env[name] is None:
            os.environ.pop(key, None)
        else:
            os.environ[key] = side_env[name]
        try:
            t0 = time.perf_counter()
            st, m = sides[name](states[name], batches[0], base)
            states[name] = st
            hard_sync(st, m)
        finally:
            if saved is None:
                os.environ.pop(key, None)
            else:
                os.environ[key] = saved
        print(f"[ab_env] warmup {name} "
              f"({key}={'unset' if side_env[name] is None else val}) "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    rates = {"A": [], "B": []}
    for leg in range(args.legs):
        for name in ("A", "B"):
            st = states[name]
            fn = sides[name]
            t0 = time.perf_counter()
            for i in range(n_disp):
                st, m = fn(st, batches[i % 4], base)
            hard_sync(st, m)
            dt = time.perf_counter() - t0
            states[name] = st
            r = bs * k * n_disp / dt
            rates[name].append(round(r, 1))
            print(f"[ab_env] leg {leg} {name}: {r:.1f} imgs/s",
                  file=sys.stderr)

    med = {n: statistics.median(v) for n, v in rates.items()}
    print(json.dumps({
        "config": args.config, "env": args.env, "batch": bs, "k": k,
        "rates": rates, "median": med,
        "b_over_a": round(med["B"] / med["A"], 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
