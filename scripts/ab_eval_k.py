#!/usr/bin/env python
"""Same-process alternating A/B of the eval epoch across --ks values.

The eval-throughput question (docs/PERFORMANCE.md: 12.5k imgs/s measured
vs a ~23.5k device forward ceiling) is transfer/dispatch-bound on the
tunneled device link, whose throughput drifts ~3x between measurement
windows — so k=1 vs k=8 must be timed in ONE process, interleaved, on the
same loader. Same rationale as scripts/ab_env.py for the train step.

Usage:
  python scripts/ab_eval_k.py --config configs/cifar100_model_a_7m.yaml \
      --ks 1 8 --reps 3 --num-samples 20480 --batch-size 256
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ks", nargs="+", type=int, default=[1, 8])
    ap.add_argument("--reps", type=int, default=3,
                    help="alternating epochs per k value")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--num-samples", type=int, default=20480,
                    help="synthetic test-split size per epoch")
    ap.add_argument("--device", default=None, choices=["cpu", "tpu", "auto"])
    args = ap.parse_args()

    import yaml

    cfg = yaml.safe_load((ROOT / args.config).read_text()
                         if not os.path.isabs(args.config)
                         else Path(args.config).read_text())
    device = (args.device
              or str(cfg.get("runtime", {}).get("device", "auto"))).lower()
    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("OUTGRIDVIT_JAX_CACHE", "/tmp/outgridvit_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from outgridvit_tpu.data import build_dataloaders
    from outgridvit_tpu.models import build_model
    from outgridvit_tpu.parallel import batch_sharding, make_mesh
    from outgridvit_tpu.training.bench_eval import evaluate_one_epoch_logs
    from outgridvit_tpu.training.optim import make_optimizer
    from outgridvit_tpu.training.steps import (
        make_eval_step,
        make_eval_superstep,
    )
    from outgridvit_tpu.training.train_state import TrainState

    model_cfg = cfg["model"]
    data_cfg = dict(cfg.get("data", {}))
    # synthetic data on the production wire: uint8 batches + in-jit
    # normalize (device_augment path), same shapes as the config
    data_cfg.update(dataset="synthetic", num_samples=args.num_samples,
                    batch_size=args.batch_size, device_augment=True,
                    val_split=0.0)
    num_classes = int(model_cfg.get("num_classes", 100))
    train, _, test = build_dataloaders(
        data_cfg, num_classes, seed=int(cfg.get("runtime", {}).get("seed", 7)))
    loader = test or train  # synthetic builder only returns a train loader
    normalize = getattr(loader, "device_normalize", None)

    from outgridvit_tpu.data.pipeline import peek_loader

    model = build_model(model_cfg, dtype=jnp.bfloat16)
    (x0, _), loader = peek_loader(loader)  # shape probe, no batch lost
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros(x0.shape, jnp.float32))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(1e-3))
    mesh = make_mesh()
    shard = batch_sharding(mesh)

    eval_step = make_eval_step(model.apply, normalize=normalize)
    supers = {k: (make_eval_superstep(model.apply, normalize=normalize)
                  if k > 1 else None) for k in args.ks}

    rates = {k: [] for k in args.ks}
    for rep in range(args.reps):
        for k in args.ks:
            m = evaluate_one_epoch_logs(
                eval_step, state, loader, data_shard=shard,
                warmup_batches=2, verbose=False,
                eval_superstep=supers[k], k=k)
            rates[k].append(round(float(m["imgs_per_sec"]), 1))
            print(f"[ab_eval_k] rep {rep} k={k}: "
                  f"{m['imgs_per_sec']:.1f} imgs/s", file=sys.stderr)

    med = {str(k): statistics.median(v) for k, v in rates.items()}
    print(json.dumps({
        "config": args.config, "batch": args.batch_size,
        "wire": "uint8" if normalize is not None else "float32",
        "rates": {str(k): v for k, v in rates.items()},
        "median": med,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
