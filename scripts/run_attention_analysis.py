#!/usr/bin/env python
"""Attention analysis CLI: outlooker locality plots, grid query heatmaps,
MAD metrics (JSON + CSV).

Same surface as the reference (`/root/reference/scripts/run_attention_analysis.py:46-68`):
``--config <yaml> --checkpoint <ckpt> --split test --out-dir analysis_out``.
"""

import argparse
import csv
import json
import sys
from pathlib import Path

import yaml

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

# per-dataset normalization stats (reference `run_attention_analysis.py:20-25`)
_STATS = {
    "cifar100": ((0.5071, 0.4867, 0.4408), (0.2675, 0.2565, 0.2761)),
    "svhn": ((0.4377, 0.4438, 0.4728), (0.1980, 0.2010, 0.1970)),
    "tinyimagenet200": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "tinyimagenet": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "synthetic": ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
    # datasets.get_synthetic_structured_dataloaders normalizes with
    # mean 0.5 / std 0.25
    "synthetic_structured": ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25)),
}


def _pick_loader(loaders, split: str):
    train, val, test = loaders
    if split == "train":
        return train
    if split == "val":
        return val if val is not None else test
    return test if test is not None else train


def main() -> int:
    ap = argparse.ArgumentParser(description="OutGridViT attention analysis")
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None, help="trained checkpoint (optional)")
    ap.add_argument("--split", default="test", choices=["train", "val", "test"])
    ap.add_argument("--out-dir", default="analysis_out")
    ap.add_argument("--n-images", type=int, default=8)
    ap.add_argument("--seed", type=int, default=10)
    ap.add_argument("--block", default="0",
                    help="block index within each stage, or 'all' to sweep "
                         "every captured block (plots only; MAD metrics use "
                         "block 0 when 'all')")
    ap.add_argument("--skip-plots", action="store_true")
    ap.add_argument("--entropy", action="store_true", help="also compute entropy")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.data import build_dataloaders
    from outgridvit_tpu.models import build_model
    from outgridvit_tpu.experiments.heatmaps import (
        plot_grid_attention_random,
        plot_outlooker_locality_random,
    )
    from outgridvit_tpu.experiments.mad_entropy import (
        compute_grid_and_outlooker_mad_by_stage,
        compute_grid_and_outlooker_mad_entropy_by_stage,
        print_mad_abs_by_stage_simple,
    )

    cfg = yaml.safe_load(Path(args.config).read_text())
    model_cfg = cfg.get("model", {})
    data_cfg = cfg.get("data", {})
    num_classes = int(model_cfg.get("num_classes", 100))

    model = build_model(model_cfg, dtype=jnp.float32, use_pallas=False)
    loaders = build_dataloaders(data_cfg, num_classes,
                                seed=int(cfg.get("runtime", {}).get("seed", 7)))
    loader = _pick_loader(loaders, args.split)

    # init / restore variables (peek keeps one-shot loaders whole)
    from outgridvit_tpu.data.pipeline import peek_loader

    (x0, _), loader = peek_loader(loader)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros(x0.shape, jnp.float32))
    if args.checkpoint:
        from outgridvit_tpu.training.checkpoints import load_checkpoint

        raw = load_checkpoint(args.checkpoint)["state"]
        from flax import serialization

        variables = serialization.from_state_dict(
            dict(variables), {"params": raw["params"],
                              "batch_stats": raw["batch_stats"]})
        print(f"Loaded checkpoint {args.checkpoint}")

    dataset = str(data_cfg.get("dataset", "cifar100")).lower()
    mean, std = _STATS.get(dataset, _STATS["cifar100"])

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    plot_block = args.block if args.block == "all" else int(args.block)
    metric_block = 0 if args.block == "all" else int(args.block)
    if not args.skip_plots:
        p1 = plot_outlooker_locality_random(
            model, variables, loader, n_images=min(2, args.n_images),
            seed=args.seed, mean=mean, std=std, out_dir=str(out_dir),
            block_idx=plot_block)
        p2 = plot_grid_attention_random(
            model, variables, loader, n_images=min(2, args.n_images),
            seed=args.seed, mean=mean, std=std, out_dir=str(out_dir),
            block_idx=plot_block)
        print("Saved plots:", *p1, *p2, sep="\n  ")

    stages = tuple(range(len(model_cfg.get("stages", []))))
    # Model B: front Outlooker blocks capture under the "front" stage key
    # (experiments/capture.py) — include them in the MAD/entropy sweep
    if int(model_cfg.get("outlooker_front_depth", 0) or 0) > 0:
        stages = ("front",) + stages
    compute = (compute_grid_and_outlooker_mad_entropy_by_stage
               if args.entropy else compute_grid_and_outlooker_mad_by_stage)
    rows = compute(
        model, variables, loader, block_idx=metric_block, stages=stages,
        n_images=args.n_images, seed=args.seed)

    # write JSON + CSV (reference `run_attention_analysis.py:146-158`)
    (out_dir / "mad_metrics.json").write_text(json.dumps(rows, indent=2))
    if rows:
        with open(out_dir / "mad_metrics.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    print(f"Wrote {out_dir / 'mad_metrics.json'} and .csv ({len(rows)} rows)")
    print_mad_abs_by_stage_simple(rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
