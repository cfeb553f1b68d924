#!/usr/bin/env python
"""Corruption-robustness evaluation CLI: CIFAR-100-C / Tiny-ImageNet-C
sweeps for a trained checkpoint.

The reference drives these suites from notebooks
(`src/data/load_cifrar100_C.py:106-152`, `load_tinyimagenet_C.py:266-332`);
this makes them a single command:

  python scripts/eval_robustness.py --config configs/cifar100_model_a_7m.yaml \
      --checkpoint outputs/best.ckpt --suite cifar100c --data-dir ./data
  python scripts/eval_robustness.py --config configs/tinyimagenet200_model_a.yaml \
      --checkpoint outputs/best.ckpt --suite tinyc --severities 1 3 5
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
    ap = argparse.ArgumentParser(description="Corruption robustness eval")
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--suite", required=True, choices=["cifar100c", "tinyc"])
    ap.add_argument("--data-dir", default=None,
                    help="corruption dataset root (default: data.data_dir)")
    ap.add_argument("--corruptions", nargs="*", default=None)
    ap.add_argument("--severities", nargs="*", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--eval-k", type=int, default=8,
                    help="batches scanned per dispatched program")
    ap.add_argument("--host-normalize", action="store_true",
                    help="normalize on the host (float32 wire) instead of "
                    "the default uint8 wire + in-jit normalize")
    ap.add_argument("--device", default=None, choices=["cpu", "tpu", "auto"],
                    help="override the config's runtime.device")
    ap.add_argument("--json-out", default="robustness_results.json")
    args = ap.parse_args()

    cfg = yaml.safe_load(Path(args.config).read_text())
    device = (args.device
              or str(cfg.get("runtime", {}).get("device", "auto"))).lower()
    if device == "cpu":  # before any backend init (train.py:87)
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.data.corruptions import (
        CIFAR100_MEAN,
        CIFAR100_STD,
        IMAGENET_MEAN,
        IMAGENET_STD,
        evaluate_cifar100c_suite,
        evaluate_tinyc_suite,
        summarize_corruption_results,
    )
    from outgridvit_tpu.models import build_model
    from outgridvit_tpu.parallel import batch_sharding, make_mesh
    from outgridvit_tpu.training.bench_eval import evaluate_one_epoch_logs
    from outgridvit_tpu.training.optim import make_optimizer
    from outgridvit_tpu.training.steps import (
        make_eval_step,
        make_eval_superstep,
    )
    from outgridvit_tpu.training.train_state import TrainState

    model_cfg = cfg.get("model", {})
    data_dir = args.data_dir or str(cfg.get("data", {}).get("data_dir", "./data"))
    img_size = int(cfg.get("data", {}).get("img_size", 32))

    model = build_model(model_cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, img_size, img_size, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=make_optimizer(1e-3))
    if args.checkpoint:
        from outgridvit_tpu.training.checkpoints import load_model_variables

        variables = load_model_variables(args.checkpoint, dict(variables))
        state = state.replace(params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}))
        print(f"Loaded {args.checkpoint}")

    mesh = make_mesh()
    shard = batch_sharding(mesh)
    # default: uint8 wire + in-jit normalize (4x less transfer) and K
    # batches scanned per dispatched program — the whole 75-setting sweep
    # is transfer/dispatch-bound on remote-device links
    device_normalize = not args.host_normalize
    norm = None
    if device_normalize:
        norm = ((CIFAR100_MEAN, CIFAR100_STD) if args.suite == "cifar100c"
                else (IMAGENET_MEAN, IMAGENET_STD))
    k = max(1, args.eval_k)
    eval_step = make_eval_step(model.apply, normalize=norm)
    eval_superstep = (make_eval_superstep(model.apply, normalize=norm)
                      if k > 1 else None)

    def evaluate_one_epoch_fn(loader):
        # pipelined epoch: prefetched overlapped transfers, K-scanned
        # dispatches, metrics bulk-fetched once (bench_eval.py)
        m = evaluate_one_epoch_logs(
            eval_step, state, loader, data_shard=shard, warmup_batches=0,
            verbose=False, eval_superstep=eval_superstep, k=k)
        return m["loss"], {key: m[key] for key in ("top1", "top3", "top5")}

    if args.suite == "cifar100c":
        rows = evaluate_cifar100c_suite(
            evaluate_one_epoch_fn, data_dir,
            corruptions=args.corruptions or None,
            severities=tuple(args.severities or (1, 2, 3, 4, 5)),
            batch_size=args.batch_size, device_normalize=device_normalize)
    else:
        from outgridvit_tpu.data.datasets import tinyimagenet_wnid_to_label

        wnid_map = tinyimagenet_wnid_to_label(
            str(cfg.get("data", {}).get("data_dir", "./data")))
        rows = evaluate_tinyc_suite(
            evaluate_one_epoch_fn, wnid_map, data_dir,
            corruptions=args.corruptions or None,
            severities=tuple(args.severities or (1, 3, 5)),
            batch_size=args.batch_size, img_size=img_size,
            device_normalize=device_normalize)

    summary = summarize_corruption_results(rows)
    print("\n=== Robustness summary ===")
    print(f"overall top1 {summary['overall_top1']:.2f}% over "
          f"{summary['n_settings']} settings")
    for s, v in summary["by_severity"].items():
        print(f"  severity {s}: {v:.2f}%")
    Path(args.json_out).write_text(
        json.dumps({"rows": rows, "summary": summary}, indent=2))
    print(f"Wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
