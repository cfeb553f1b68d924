#!/usr/bin/env python
"""Timed evaluation benchmark — the CLI surface of
`evaluate_one_epoch_logs` (the reference's source of all published
throughput numbers, `src/training/eval_one_epoch_logs.py`).

Example:
  python scripts/benchmark_eval.py --config configs/cifar100_model_a_7m.yaml \
      --checkpoint outputs/best.ckpt --split test
  python scripts/benchmark_eval.py --config configs/smoke_synthetic.yaml
"""

import argparse
import json
import sys
from pathlib import Path

import yaml

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def main() -> int:
    ap = argparse.ArgumentParser(description="Timed eval benchmark")
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--split", default="test", choices=["train", "val", "test"])
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--eval-k", type=int, default=-1,
                    help="batches scanned per dispatched program "
                    "(-1 auto: 8 on the uint8 wire, 1 otherwise)")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--device", default=None, choices=["cpu", "tpu", "auto"],
                    help="override the config's runtime.device")
    args = ap.parse_args()

    cfg = yaml.safe_load(Path(args.config).read_text())
    device = (args.device
              or str(cfg.get("runtime", {}).get("device", "auto"))).lower()
    if device == "cpu":  # must happen before any backend init (train.py:87)
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.data import build_dataloaders
    from outgridvit_tpu.models import build_model
    from outgridvit_tpu.parallel import batch_sharding, make_mesh
    from outgridvit_tpu.training.bench_eval import evaluate_one_epoch_logs
    from outgridvit_tpu.training.steps import (
        make_eval_step,
        make_eval_superstep,
    )
    from outgridvit_tpu.training.train_state import TrainState
    from outgridvit_tpu.training.optim import make_optimizer

    model_cfg = cfg.get("model", {})
    data_cfg = dict(cfg.get("data", {}))
    if args.batch_size:
        data_cfg["batch_size"] = args.batch_size
    num_classes = int(model_cfg.get("num_classes", 100))

    model = build_model(model_cfg, dtype=jnp.bfloat16)
    loaders = build_dataloaders(data_cfg, num_classes,
                                seed=int(cfg.get("runtime", {}).get("seed", 7)))
    train, val, test = loaders
    loader = {"train": train, "val": val or test or train,
              "test": test or train}[args.split]

    from outgridvit_tpu.data.pipeline import peek_loader

    (x0, _), loader_iter = peek_loader(loader)  # shape probe, no batch lost
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros(x0.shape, jnp.float32))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(1e-3))
    if args.checkpoint:
        from outgridvit_tpu.training.checkpoints import load_model_variables

        variables = load_model_variables(args.checkpoint, dict(variables))
        state = state.replace(params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}))
        print(f"Loaded {args.checkpoint}")

    mesh = make_mesh()
    normalize = getattr(loader, "device_normalize", None)
    eval_step = make_eval_step(model.apply, normalize=normalize)
    k = args.eval_k
    if k < 0:  # auto: scan-dispatch only the light uint8 wire
        k = 8 if normalize is not None else 1
    eval_superstep = (make_eval_superstep(model.apply, normalize=normalize)
                      if k > 1 else None)
    metrics = evaluate_one_epoch_logs(
        eval_step, state, loader_iter, data_shard=batch_sharding(mesh),
        model_fn=lambda x: model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x),
        example_batch=jnp.zeros(x0.shape, jnp.float32),
        eval_superstep=eval_superstep, k=k,
    )
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(metrics, indent=2))
        print(f"Wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
