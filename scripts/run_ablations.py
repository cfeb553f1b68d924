#!/usr/bin/env python
"""Ablation suite: full OutGridBlock vs no-Outlooker vs no-GridAttn vs
plain-MBConv, under one recipe.

First-class version of the reference's ablation notebooks
(`experiments_results/Abliations/Abliations.ipynb` cell 3: configs built with
outlook_heads=0 / num_heads=0 / plain) — possible here without hacked blocks
because heads=0 skip-branch is native (SURVEY.md §2.6).
"""

import argparse
import json
import sys
from pathlib import Path

import yaml

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

ABLATIONS = {
    "full": {},
    "no_outlooker": {"outlook_heads": 0},
    "no_grid": {"num_heads": 0},
    "plain_mbconv": {"outlook_heads": 0, "num_heads": 0},
    "no_mbconv": {"use_mbconv": False},
}


def main() -> int:
    ap = argparse.ArgumentParser(description="OutGridBlock ablations")
    ap.add_argument("--config", required=True, help="base YAML config")
    ap.add_argument("--ablations", nargs="+", default=list(ABLATIONS),
                    choices=list(ABLATIONS))
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--output-dir", default="outputs/ablations")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from outgridvit_tpu.data import build_dataloaders
    from outgridvit_tpu.models import build_model
    from outgridvit_tpu.training import train_model
    from outgridvit_tpu.utils.history import save_history

    cfg = yaml.safe_load(Path(args.config).read_text())
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    num_classes = int(cfg["model"].get("num_classes", 100))
    seed = int(cfg.get("runtime", {}).get("seed", 7))
    train_loader, val_loader, _ = build_dataloaders(
        cfg.get("data", {}), num_classes, seed=seed)
    tcfg = cfg.get("training", {})
    epochs = args.epochs or int(tcfg.get("epochs", 1))

    summary = {}
    for name in args.ablations:
        print(f"\n##### Ablation: {name} #####")
        model_cfg = json.loads(json.dumps(cfg["model"]))  # deep copy
        for stage in model_cfg["stages"]:
            stage.update(ABLATIONS[name])
        model = build_model(model_cfg)
        history, _ = train_model(
            model=model,
            train_loader=train_loader,
            epochs=epochs,
            val_loader=val_loader,
            lr=float(tcfg.get("lr", 5e-4)),
            weight_decay=float(tcfg.get("weight_decay", 0.05)),
            autocast_dtype=str(tcfg.get("autocast_dtype", "bf16")),
            use_amp=bool(tcfg.get("use_amp", True)),
            label_smoothing=float(tcfg.get("label_smoothing", 0.1)),
            mixup_alpha=float(tcfg.get("mixup_alpha", 0.0)),
            cutmix_alpha=float(tcfg.get("cutmix_alpha", 0.0)),
            mix_prob=float(tcfg.get("mix_prob", 1.0)),
            num_classes=num_classes,
            print_every=int(tcfg.get("print_every", 100)),
            save_path=str(out_dir / f"best_{name}.ckpt"),
            last_path=str(out_dir / f"last_{name}.ckpt"),
            early_stop=False,
            seed=seed,
        )
        save_history(history, str(out_dir / f"history_{name}.pkl"))
        summary[name] = {
            "final_train_top1": history["train_top1"][-1],
            "best_val_top1": max(history["val_top1"]) if history["val_top1"] else None,
        }

    print("\n===== Ablation summary =====")
    for name, s in summary.items():
        bv = f"{s['best_val_top1']:.2f}%" if s["best_val_top1"] is not None else "n/a"
        print(f"{name}: train top1 {s['final_train_top1']:.2f}% | best val {bv}")
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
