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


class BenchContext:
    """Everything the full-train-step benches share (bench_config and the
    A/B harnesses build the SAME configuration from one code path, so the
    benchmarked recipe cannot drift between scripts)."""

    def __init__(self, config_path: str, img_size=None, augment=True):
        import yaml
        import jax
        import jax.numpy as jnp

        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("OUTGRIDVIT_JAX_CACHE",
                               "/tmp/outgridvit_jax_cache"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

        from outgridvit_tpu.models import build_model
        from outgridvit_tpu.ops.augment import AugmentConfig
        from outgridvit_tpu.parallel import make_mesh
        from outgridvit_tpu.training.optim import (
            make_optimizer,
            warmup_cosine_lr,
        )
        from outgridvit_tpu.training.steps import StepConfig

        cfg = yaml.safe_load((ROOT / config_path).read_text()
                             if not os.path.isabs(config_path)
                             else Path(config_path).read_text())
        data_cfg = cfg.get("data", {})
        tcfg = cfg["training"]
        self.cfg = cfg
        self.img = img_size or int(data_cfg.get("img_size", 32))
        dataset = data_cfg.get("dataset", "cifar100")
        mean, std = STATS.get(dataset, STATS["cifar100"])
        # reference crop-pad rule (`load_cifrar100.py:39-44` et al.)
        crop_pad = (max(8, self.img // 8) if dataset.startswith("tiny")
                    else max(4, self.img // 8))
        self.num_classes = int(cfg["model"]["num_classes"])

        self.model = build_model(cfg["model"], dtype=jnp.bfloat16)
        self.mesh = make_mesh()
        self.schedule = warmup_cosine_lr(float(tcfg["lr"]), 10_000, 500,
                                         float(tcfg["min_lr"]))
        self.tx = make_optimizer(self.schedule, float(tcfg["weight_decay"]),
                                 tcfg.get("grad_clip_norm", 1.0))
        self.variables = jax.jit(self.model.init)(
            jax.random.PRNGKey(1),
            jnp.zeros((2, self.img, self.img, 3), jnp.float32))

        self.aug = None if not augment else AugmentConfig(
            mean=mean, std=std, crop_pad=crop_pad,
            ra_num_ops=int(data_cfg.get("ra_num_ops", 2)),
            ra_magnitude=int(data_cfg.get("ra_magnitude", 7)),
            random_erasing_p=float(data_cfg.get("random_erasing_p", 0.25)))
        self.step_cfg = StepConfig(
            num_classes=self.num_classes,
            label_smoothing=float(tcfg.get("label_smoothing", 0.1)),
            mixup_alpha=float(tcfg.get("mixup_alpha", 0.8)),
            cutmix_alpha=float(tcfg.get("cutmix_alpha", 1.0)),
            mix_prob=float(tcfg.get("mix_prob", 0.5)),
            grad_clip_norm=tcfg.get("grad_clip_norm", 1.0),
            augment=self.aug,
        )

    def fresh_state(self):
        """New donated-safe TrainState, sharded on the mesh."""
        import jax
        import jax.numpy as jnp

        from outgridvit_tpu.parallel import shard_train_state
        from outgridvit_tpu.training.train_state import TrainState

        fresh = jax.tree_util.tree_map(jnp.array, self.variables)
        state = TrainState.create(
            apply_fn=self.model.apply, params=fresh["params"],
            batch_stats=fresh.get("batch_stats", {}), tx=self.tx)
        return shard_train_state(state, self.mesh)

    def make_batches(self, bshape, bshard, n=4):
        """n device-resident synthetic batches: raw uint8 when the in-jit
        augment recipe runs, pre-normalized float32 otherwise."""
        import jax
        import jax.numpy as jnp

        rng = jax.random.PRNGKey(0)
        batches = []
        for i in range(n):
            kx = jax.random.fold_in(rng, i)
            if self.aug is not None:
                xb = jax.random.randint(
                    kx, bshape + (self.img, self.img, 3), 0, 255,
                    dtype=jnp.int32).astype(jnp.uint8)
            else:
                xb = jax.random.normal(kx, bshape + (self.img, self.img, 3),
                                       jnp.float32)
            yb = jax.random.randint(jax.random.fold_in(rng, 100 + i),
                                    bshape, 0, self.num_classes)
            batches.append((jax.device_put(xb, bshard),
                            jax.device_put(yb, bshard)))
        return batches


def hard_sync(state, m):
    """Real device->host fetch: `jax.block_until_ready` is unreliable for
    chained donated-state dispatch over the tunneled dev link
    (docs/PERFORMANCE.md measurement methodology)."""
    import jax
    import numpy as np

    jax.device_get(m["loss"])
    np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[0]


def bench_entry(ctx, bs: int, k: int, steps: int, legs: int = 1):
    """Warm up, time `steps` train steps (best of `legs` legs), and return
    {imgs_per_sec, step_ms, mfu, hbm_util, hbm_util_measured, params,
    flops_per_step} for one (config, batch, K) point."""
    import jax

    from outgridvit_tpu.parallel import batch_sharding, superbatch_sharding
    from outgridvit_tpu.training.steps import (
        make_train_step,
        make_train_superstep,
    )
    from outgridvit_tpu.utils.roofline import (
        chip_peaks,
        compiled_cost,
        compiled_hbm_traffic,
        roofline_report,
    )

    k = max(1, k)
    if k > 1:
        step_fn = make_train_superstep(ctx.step_cfg, lr_schedule=ctx.schedule)
        bshard = superbatch_sharding(ctx.mesh)
        bshape = (k, bs)
    else:
        step_fn = make_train_step(ctx.step_cfg, lr_schedule=ctx.schedule)
        bshard = batch_sharding(ctx.mesh)
        bshape = (bs,)

    n_chips = len(jax.devices())
    state = ctx.fresh_state()
    batches = ctx.make_batches(bshape, bshard)
    base = jax.random.PRNGKey(2)
    n_disp = max(1, steps // k)
    t0 = time.perf_counter()
    for i in range(max(1, 16 // k)):
        state, m = step_fn(state, batches[i % 4], base)
    hard_sync(state, m)
    print(f"[bench_config] bs={bs} k={k} warmup+compile "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    leg_dts = []
    for _ in range(max(1, legs)):
        t0 = time.perf_counter()
        for i in range(n_disp):
            state, m = step_fn(state, batches[i % 4], base)
        hard_sync(state, m)
        leg_dts.append(time.perf_counter() - t0)
    dt = min(leg_dts)
    rate = bs * k * n_disp / dt
    step_s = dt / (n_disp * k)

    flops_d, bytes_d = compiled_cost(step_fn, state, batches[0], base)
    roof = roofline_report(
        flops_d / k if flops_d else None,
        bytes_d / k if bytes_d else None,
        step_s, n_chips=n_chips)
    traffic = compiled_hbm_traffic(step_fn, state, batches[0], base,
                                   default_trip=k)
    if traffic and traffic.get("total_bytes"):
        bps = traffic["total_bytes"] / k
        _, peak_bw, _ = chip_peaks()
        roof["bytes_per_step_hlo"] = bps
        roof["hbm_util_measured"] = (
            round(bps / max(step_s, 1e-12) / peak_bw / max(1, n_chips), 4)
            if peak_bw else None)
    params = sum(int(p.size)
                 for p in jax.tree_util.tree_leaves(ctx.variables["params"]))
    return {"imgs_per_sec": round(rate, 1), "params": params, **roof}


# the publish-everything matrix (round-5 verdict ask): every shipped model
# config gets {imgs/s, step_ms, MFU, roofline, params} each round, matching
# the reference's habit of publishing throughput for every model it ships
# (`logs/Logs Models Comparisons Cifrar100 100epocs.txt:49,55-283`).
MATRIX = (
    ("modelA_7M_cifar100_32", "configs/cifar100_model_a_7m.yaml", 128, 8),
    ("modelA_22M_tinyimagenet_64", "configs/tinyimagenet200_model_a.yaml",
     128, 8),
    ("modelA_14M_cifar100_64", "configs/cifar100_64_model_a.yaml", 128, 8),
    ("modelB_cifar100_32", "configs/cifar100_model_b.yaml", 128, 8),
    ("modelA_14M_svhn_32", "configs/svhn_model_a.yaml", 128, 8),
)


def run_matrix(args) -> int:
    results = {}
    for label, cfg_path, bs, k in MATRIX:
        ctx = BenchContext(cfg_path, None, augment=True)
        try:
            row = bench_entry(ctx, bs, k, args.steps, legs=args.legs)
        except Exception as e:  # noqa: BLE001 — record the failure, continue
            print(f"[bench_config] {label} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
            results[label] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            continue
        row.update(config=cfg_path, img_size=ctx.img, batch=bs, k=k)
        results[label] = row
        print(f"[bench_config] {label}: {row['imgs_per_sec']} imgs/s | "
              f"{row['step_ms']} ms/step | mfu {row.get('mfu')} | "
              f"hbm_util_measured {row.get('hbm_util_measured')}",
              file=sys.stderr)
    payload = {"matrix": results, "legs": args.legs,
               "estimator": "min_time_of_legs"}
    print(json.dumps(payload))
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(payload, indent=1))
        print(f"[bench_config] wrote {args.out}", file=sys.stderr)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--matrix", action="store_true",
                    help="bench every shipped config (MATRIX) in one "
                    "process and emit a single JSON")
    ap.add_argument("--legs", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--ks", type=int, nargs="+", default=None,
                    help="sweep the scan-dispatch depth K at the first "
                    "--batch size (one process, same window)")
    ap.add_argument("--steps", type=int, default=96,
                    help="measured single steps per batch size")
    ap.add_argument("--img-size", type=int, default=None)
    ap.add_argument("--no-augment", action="store_true")
    args = ap.parse_args()

    if args.matrix:
        return run_matrix(args)
    if not args.config:
        ap.error("--config is required unless --matrix is given")

    import jax

    from outgridvit_tpu.parallel import batch_sharding, superbatch_sharding
    from outgridvit_tpu.training.steps import (
        make_train_step,
        make_train_superstep,
    )

    ctx = BenchContext(args.config, args.img_size,
                       augment=not args.no_augment)
    img = ctx.img
    k = max(1, args.k)
    if k > 1:
        step_fn = make_train_superstep(ctx.step_cfg, lr_schedule=ctx.schedule)
        bshard = superbatch_sharding(ctx.mesh)
    else:
        step_fn = make_train_step(ctx.step_cfg, lr_schedule=ctx.schedule)
        bshard = batch_sharding(ctx.mesh)

    if args.ks:
        # K sweep: fixed batch (first --batch), one jitted superstep whose
        # scan depth is a trace-time property of the (k, bs) batch shape.
        bs = args.batch[0]
        results = {}
        for kk in args.ks:
            kk = max(1, kk)
            fn = (make_train_superstep(ctx.step_cfg,
                                       lr_schedule=ctx.schedule)
                  if kk > 1 else
                  make_train_step(ctx.step_cfg, lr_schedule=ctx.schedule))
            shard = (superbatch_sharding(ctx.mesh) if kk > 1
                     else batch_sharding(ctx.mesh))
            state = ctx.fresh_state()
            batches = ctx.make_batches((kk, bs) if kk > 1 else (bs,), shard)
            base = jax.random.PRNGKey(2)
            n_disp = max(1, args.steps // kk)
            try:
                for i in range(max(1, 16 // kk)):
                    state, m = fn(state, batches[i % 4], base)
                hard_sync(state, m)
            except Exception as e:  # noqa: BLE001
                print(f"[bench_config] k={kk} FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}", file=sys.stderr)
                results[kk] = None
                continue
            t0 = time.perf_counter()
            for i in range(n_disp):
                state, m = fn(state, batches[i % 4], base)
            hard_sync(state, m)
            dt = time.perf_counter() - t0
            rate = bs * kk * n_disp / dt
            results[kk] = round(rate, 1)
            print(f"[bench_config] k={kk}: {rate:.1f} imgs/s", file=sys.stderr)
        print(json.dumps({"config": args.config, "img_size": img, "bs": bs,
                          "k_sweep": results}))
        return 0

    from outgridvit_tpu.utils.roofline import compiled_cost, roofline_report

    results = {}
    rooflines = {}
    n_chips = len(jax.devices())
    for bs in args.batch:
        state = ctx.fresh_state()
        bshape = (k, bs) if k > 1 else (bs,)
        batches = ctx.make_batches(bshape, bshard)
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
        # MFU + HBM roofline for the exact program timed (compile cached)
        flops_d, bytes_d = compiled_cost(step_fn, state, batches[0], base)
        roof = roofline_report(
            flops_d / k if flops_d else None,
            bytes_d / k if bytes_d else None,
            dt / (n_disp * k), n_chips=n_chips)
        rooflines[bs] = roof
        print(f"[bench_config] bs={bs}: {rate:.1f} imgs/s "
              f"({1000 * dt / (k * n_disp):.2f} ms/step | "
              f"mfu {roof['mfu']} | hbm_util {roof['hbm_util']})",
              file=sys.stderr)

    print(json.dumps({"config": args.config, "img_size": img, "k": k,
                      "imgs_per_sec": results, "roofline": rooflines}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
