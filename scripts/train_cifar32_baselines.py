#!/usr/bin/env python
"""Train baseline models under the identical OutGridViT recipe.

TPU equivalent of the reference baseline runner
(`/root/reference/scripts/train_cifar32_baselines.py`): same shared
hyperparameters (lr 5e-4, wd 0.05, warmup 0.05, mix_prob 0.5, mixup 0.8,
cutmix 1.0, label smoothing 0.1, `:151-159`), one model per --models entry,
through the same `train_model` loop. timm doesn't exist for JAX; the
architectures are reimplemented in `outgridvit_tpu.models.baselines`.
"""

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def parse_args():
    ap = argparse.ArgumentParser(description="CIFAR-32 baseline comparisons")
    ap.add_argument("--models", nargs="+",
                    default=["deit_tiny_patch4", "deit_small_patch4",
                             "swin_tiny_patch2", "maxvit_nano_cifar",
                             "maxvit_tiny_cifar", "resnet18_cifar"],
                    help="baseline names (see models/baselines.py); default "
                         "matches the reference's six-model comparison set "
                         "(train_cifar32_baselines.py:138)")
    ap.add_argument("--dataset", default="cifar100")
    ap.add_argument("--data-dir", default="./data")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--img-size", type=int, default=32)
    ap.add_argument("--num-classes", type=int, default=100)
    ap.add_argument("--val-split", type=float, default=0.1)
    ap.add_argument("--num-workers", type=int, default=8)
    ap.add_argument("--output-dir", default="outputs/baselines")
    ap.add_argument("--seed", type=int, default=7)
    # shared recipe defaults (reference `train_cifar32_baselines.py:151-159`)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--weight-decay", type=float, default=0.05)
    ap.add_argument("--warmup-ratio", type=float, default=0.05)
    ap.add_argument("--mix-prob", type=float, default=0.5)
    ap.add_argument("--mixup-alpha", type=float, default=0.8)
    ap.add_argument("--cutmix-alpha", type=float, default=1.0)
    ap.add_argument("--label-smoothing", type=float, default=0.1)
    ap.add_argument("--print-every", type=int, default=200)
    ap.add_argument("--num-samples", type=int, default=512,
                    help="synthetic dataset size (dataset=synthetic)")
    return ap.parse_args()


def main() -> int:
    args = parse_args()

    from outgridvit_tpu.data import build_dataloaders
    from outgridvit_tpu.models.baselines import build_baseline
    from outgridvit_tpu.training import train_model

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    data_cfg = {
        "dataset": args.dataset,
        "data_dir": args.data_dir,
        "batch_size": args.batch_size,
        "num_workers": args.num_workers,
        "val_split": args.val_split,
        "img_size": args.img_size,
        "num_samples": args.num_samples,
        "seed": args.seed,
    }
    train_loader, val_loader, _ = build_dataloaders(
        data_cfg, args.num_classes, seed=args.seed)

    summaries = {}
    for name in args.models:
        print(f"\n##### Baseline: {name} #####")
        model = build_baseline(name, args.num_classes)
        history, _ = train_model(
            model=model,
            train_loader=train_loader,
            epochs=args.epochs,
            val_loader=val_loader,
            lr=args.lr,
            weight_decay=args.weight_decay,
            warmup_ratio=args.warmup_ratio,
            label_smoothing=args.label_smoothing,
            mixup_alpha=args.mixup_alpha,
            cutmix_alpha=args.cutmix_alpha,
            mix_prob=args.mix_prob,
            num_classes=args.num_classes,
            print_every=args.print_every,
            save_path=str(out_dir / f"best_{name}.ckpt"),
            last_path=str(out_dir / f"last_{name}.ckpt"),
            early_stop=False,
            seed=args.seed,
        )
        best_val = max(history["val_top1"]) if history["val_top1"] else None
        summaries[name] = {
            "final_train_top1": history["train_top1"][-1],
            "best_val_top1": best_val,
        }

    print("\n===== Baseline summary =====")
    for name, s in summaries.items():
        bv = f"{s['best_val_top1']:.2f}%" if s["best_val_top1"] is not None else "n/a"
        print(f"{name}: train top1 {s['final_train_top1']:.2f}% | best val top1 {bv}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
