#!/usr/bin/env python
"""Export a trained model as a standalone serving artifact (StableHLO via
``jax.export``: weights baked in, no model code or checkpoint needed at
load time). Beyond the reference, which has no deployment surface.

  python scripts/export_model.py --config configs/cifar100_model_a_7m.yaml \
      --checkpoint outputs/best.ckpt --batch-size 64 --out model.ogvt
  # smoke round trip:
  python scripts/export_model.py --config configs/smoke_synthetic.yaml \
      --out /tmp/m.ogvt --selfcheck
"""

import argparse
import sys
from pathlib import Path

import yaml

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def main() -> int:
    ap = argparse.ArgumentParser(description="Export a serving artifact")
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--out", required=True)
    ap.add_argument("--platforms", nargs="*", default=None,
                    help="lowering platforms (default: current backend), "
                    "e.g. --platforms tpu cpu")
    ap.add_argument("--selfcheck", action="store_true",
                    help="reload the artifact and verify it reproduces the "
                    "live predictor's outputs")
    ap.add_argument("--device", default=None, choices=["cpu", "tpu", "auto"])
    args = ap.parse_args()

    cfg = yaml.safe_load(Path(args.config).read_text())
    device = (args.device
              or str(cfg.get("runtime", {}).get("device", "auto"))).lower()
    if device == "cpu":  # before any backend init (train.py:87)
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from outgridvit_tpu.serving import (
        build_predictor,
        export_predictor,
        load_predictor,
    )
    from outgridvit_tpu.data import datasets as D

    # the artifact bakes the normalization in: the stats MUST match what
    # the model was trained with — derive them from the config's dataset
    # (same mapping as the loaders), never a silent cross-dataset default
    stats = {
        "cifar100": (D.CIFAR100_MEAN, D.CIFAR100_STD),
        "svhn": (D.SVHN_MEAN, D.SVHN_STD),
        "tinyimagenet200": (D.IMAGENET_MEAN, D.IMAGENET_STD),
        "food101": (D.IMAGENET_MEAN, D.IMAGENET_STD),
        "pets": (D.IMAGENET_MEAN, D.IMAGENET_STD),
        "synthetic": ((0.5,) * 3, (0.25,) * 3),
    }
    data_cfg = cfg.get("data", {})
    if "mean" in data_cfg and "std" in data_cfg:
        mean, std = data_cfg["mean"], data_cfg["std"]
    else:
        dataset = str(data_cfg.get("dataset", "")).lower()
        if dataset not in stats:
            ap.error(f"unknown dataset {dataset!r}: set data.mean/data.std "
                     "in the config so the artifact bakes the right "
                     "normalization")
        mean, std = stats[dataset]

    # Pallas custom calls traced on one backend cannot lower for another;
    # a multi/foreign-platform export must use the portable XLA path
    use_pallas = None
    if args.platforms and set(args.platforms) != {jax.default_backend()}:
        use_pallas = False
        print(f"portable export for {args.platforms}: XLA-only compute "
              "path (Pallas kernels are backend-specific)")

    img = int(data_cfg.get("img_size", 32))
    pred = build_predictor(
        cfg["model"], checkpoint=args.checkpoint,
        batch_size=args.batch_size, img_size=img,
        mean=mean, std=std, use_pallas=use_pallas)
    export_predictor(pred, args.out, platforms=args.platforms)
    print(f"Exported {args.out} "
          f"({Path(args.out).stat().st_size / 1e6:.1f} MB, "
          f"batch {pred.batch_size}, {img}px, {pred.num_classes} classes)")

    if args.selfcheck:
        rng = np.random.default_rng(0)
        x = rng.integers(0, 255, (3, img, img, 3), dtype=np.uint8)
        l1, p1 = pred.predict(x)
        l2, p2 = load_predictor(args.out).predict(x)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-6)
        print("selfcheck OK: reloaded artifact matches the live predictor")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
