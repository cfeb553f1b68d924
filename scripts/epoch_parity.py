"""Epoch-scale convergence parity vs the ACTUAL PyTorch reference code.

Extends the 8-step trajectory parity (tests/test_torch_parity.py) to epoch
scale: train the reference's own `MaxOutNet` + `train_model`
(/root/reference/src/training/train_full_model.py:24-305) and this
framework's `train_model` (outgridvit_tpu/training/loop.py) on the SAME
synthetic structured dataset, from PORTED IDENTICAL initial weights, and
compare per-epoch train/val curves.

Two recipes:

- ``--recipe plain`` (the round-4 artifact): label-smoothed CE, masked
  AdamW, warmup-cosine, clip 1.0 — augmentation and mixup/cutmix OFF.
  Batch order is the only uncontrolled difference, so curves must match
  within that noise.
- ``--recipe full``: the reference's ACTUAL training recipe — host
  torchvision RandomCrop(pad)/flip/RandAugment(2,7)/Normalize/
  RandomErasing(0.25) (`src/data/load_cifrar100.py:44-60`) + mixup 0.8 /
  cutmix 1.0 @ prob 0.5 + soft-target CE
  (`src/training/one_epoch_train.py:78-96`) on the reference side, vs this
  framework's in-jit augmentation engine (ops/augment.py) + in-step
  mixing on ours. RNG streams necessarily differ (torch/PIL vs
  jax.random), so run ``--seeds a b c`` and compare statistically:
  final metrics within seed spread, same convergence shape.

Runs on CPU (both sides) by design: identical hardware numerics, and the
torch reference has no TPU path. Usage:

    python scripts/epoch_parity.py --epochs 12 --out docs/evidence/epoch_parity.json
    python scripts/epoch_parity.py --recipe full --epochs 16 --seeds 7 8 9 \
        --noise 100 --out docs/evidence/epoch_parity_fullrecipe.json
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # same-hardware comparison

import numpy as np

REPO = Path(__file__).resolve().parents[1]
REFERENCE = Path(os.environ.get("OUTGRIDVIT_REFERENCE", "/root/reference"))
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
if str(REFERENCE) not in sys.path:
    sys.path.insert(0, str(REFERENCE))

MEAN, STD = 0.5, 0.25  # plain per-channel normalization on both sides
KEYS = ("train_loss", "train_top1", "val_loss", "val_top1")


def _stages():
    from outgridvit_tpu.stage_config import StageCfg

    # tiny 2-stage config (same family as tests/test_torch_parity.py STAGES)
    return (
        StageCfg(dim=16, depth=1, num_heads=2, grid_size=4, outlook_heads=2,
                 outlook_kernel=3),
        StageCfg(dim=24, depth=2, num_heads=3, grid_size=2, outlook_heads=3,
                 outlook_kernel=3),
    )


def _ref_stages(stages):
    from src.stage_config import StageCfg as RefStageCfg

    return [
        RefStageCfg(
            dim=s.dim, depth=s.depth, num_heads=s.num_heads,
            grid_size=s.grid_size, window_size=s.window_size,
            outlook_heads=s.outlook_heads, outlook_kernel=s.outlook_kernel,
            outlook_mlp_ratio=s.outlook_mlp_ratio,
            mbconv_expand_ratio=s.mbconv_expand_ratio,
            mbconv_se_ratio=s.mbconv_se_ratio, mbconv_act=s.mbconv_act,
            use_bn=s.use_bn, attn_drop=s.attn_drop, proj_drop=s.proj_drop,
            ffn_drop=s.ffn_drop, drop_path=s.drop_path,
            mlp_ratio=s.mlp_ratio, mlp_act=s.mlp_act,
        )
        for s in stages
    ]


def make_data(args, seed):
    """Raw uint8 draws; both sides share them exactly. Class prototypes are
    pinned by --proto-seed so every seed trains on the same task."""
    from outgridvit_tpu.data.datasets import synth_structured_arrays

    xtr, ytr = synth_structured_arrays(
        args.samples, img_size=args.img, num_classes=args.classes,
        seed=seed, noise=args.noise, proto_seed=args.proto_seed)
    xva, yva = synth_structured_arrays(
        max(512, args.samples // 4), img_size=args.img,
        num_classes=args.classes, seed=seed + 1, noise=args.noise,
        proto_seed=args.proto_seed)
    return xtr, ytr, xva, yva


def _norm(x):
    return ((x.astype(np.float32) / 255.0) - MEAN) / STD


def run_ours(args, seed, xtr, ytr, xva, yva, init_state_dict):
    import jax
    import jax.numpy as jnp

    from outgridvit_tpu.data.pipeline import ArrayDataLoader
    from outgridvit_tpu.models import MaxOutNet
    from outgridvit_tpu.training.loop import train_model
    from outgridvit_tpu.training.optim import make_optimizer, warmup_cosine_lr
    from outgridvit_tpu.training.train_state import TrainState
    from outgridvit_tpu.utils.port_torch import port_torch_state_dict

    model = MaxOutNet(num_classes=args.classes, stages=_stages(), in_ch=3,
                      stem_dim=16, dpr_max=0.0, use_pallas=False)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, args.img, args.img, 3)))
    variables = port_torch_state_dict(init_state_dict, variables)

    full = args.recipe == "full"
    if full:
        # raw uint8 on the wire; the WHOLE recipe runs in-jit
        from outgridvit_tpu.ops.augment import AugmentConfig

        train_loader = ArrayDataLoader(xtr, ytr, batch_size=args.batch,
                                       shuffle=True, seed=seed,
                                       num_threads=1)
        train_loader.device_augment = AugmentConfig(
            mean=(MEAN,) * 3, std=(STD,) * 3,
            crop_pad=max(4, args.img // 8))
        val_loader = ArrayDataLoader(xva, yva, batch_size=args.batch,
                                     shuffle=False, num_threads=1)
        val_loader.device_normalize = ((MEAN,) * 3, (STD,) * 3)
    else:
        train_loader = ArrayDataLoader(_norm(xtr), ytr,
                                       batch_size=args.batch, shuffle=True,
                                       seed=seed, num_threads=1)
        val_loader = ArrayDataLoader(_norm(xva), yva, batch_size=args.batch,
                                     shuffle=False, num_threads=1)

    total_steps = args.epochs * len(train_loader)
    schedule = warmup_cosine_lr(args.lr, total_steps,
                                int(total_steps * 0.05), 0.0)
    tx = make_optimizer(schedule, args.wd, 1.0)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}),
                              tx=tx)

    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        history, _ = train_model(
            model, train_loader, epochs=args.epochs, val_loader=val_loader,
            lr=args.lr, weight_decay=args.wd, use_amp=False,
            autocast_dtype="fp32", grad_clip_norm=1.0, warmup_ratio=0.05,
            label_smoothing=0.1, print_every=1000,
            save_path=os.path.join(td, "best.ckpt"),
            last_path=os.path.join(td, "last.ckpt"),
            mixup_alpha=args.mixup if full else 0.0,
            cutmix_alpha=args.cutmix if full else 0.0,
            mix_prob=args.mix_prob,
            num_classes=args.classes, early_stop=False, seed=seed,
            state=state)
        dt = time.time() - t0
    return history, dt


def run_reference(args, seed, xtr, ytr, xva, yva, ref_model):
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    from src.training.train_full_model import train_model as ref_train_model

    full = args.recipe == "full"
    torch.manual_seed(seed)  # transform + mixing RNG
    g = torch.Generator().manual_seed(seed)

    if full:
        # The reference's host recipe (`load_cifrar100.py:44-60`).
        # torchvision is NOT installed in this environment (the reference's
        # own loaders cannot even import here), so the transform stack is
        # this repo's host reimplementation of the same torchvision recipe
        # (data/transforms.py — PIL-conventions bit-matched, unit-tested in
        # tests/test_data.py / tests/test_device_augment.py). Everything
        # else on this side IS the reference's own code: its train loop,
        # its apply_mixup_cutmix, its soft-target CE, its schedule.
        from outgridvit_tpu.data.transforms import TrainTransform

        train_tf = TrainTransform(
            img_size=args.img, native_size=args.img,
            mean=(MEAN,) * 3, std=(STD,) * 3,
            ra_num_ops=2, ra_magnitude=7, random_erasing_p=0.25)

        class HostAugDataset(torch.utils.data.Dataset):
            """uint8 HWC -> augmented float32 CHW, fresh rng per fetch
            (per-epoch re-draws, like a torchvision train pipeline)."""

            def __init__(self, x_u8, y, tf, seed):
                self.x, self.y, self.tf = x_u8, y, tf
                self.ss = np.random.SeedSequence((seed, 0xA06))
                self.rng = np.random.default_rng(self.ss)

            def __len__(self):
                return len(self.y)

            def __getitem__(self, i):
                out = self.tf(self.x[i], self.rng) if self.tf else _norm(
                    self.x[i])
                return (torch.from_numpy(
                    np.ascontiguousarray(out.transpose(2, 0, 1))),
                    int(self.y[i]))

        train_loader = DataLoader(
            HostAugDataset(xtr, ytr, train_tf, seed),
            batch_size=args.batch, shuffle=True, generator=g)
        val_loader = DataLoader(HostAugDataset(xva, yva, None, seed + 1),
                                batch_size=args.batch, shuffle=False)
    else:
        def to_nchw(x):
            return torch.from_numpy(
                np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

        train_loader = DataLoader(
            TensorDataset(to_nchw(_norm(xtr)), torch.from_numpy(ytr)),
            batch_size=args.batch, shuffle=True, generator=g)
        val_loader = DataLoader(
            TensorDataset(to_nchw(_norm(xva)), torch.from_numpy(yva)),
            batch_size=args.batch, shuffle=False)

    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        history, _ = ref_train_model(
            ref_model, train_loader, epochs=args.epochs,
            val_loader=val_loader, device="cpu", lr=args.lr,
            weight_decay=args.wd, use_amp=False, autocast_dtype="fp32",
            grad_clip_norm=1.0, warmup_ratio=0.05, label_smoothing=0.1,
            print_every=1000,
            save_path=os.path.join(td, "best.pt"),
            last_path=os.path.join(td, "last.pt"),
            mixup_alpha=args.mixup if full else 0.0,
            cutmix_alpha=args.cutmix if full else 0.0,
            mix_prob=args.mix_prob,
            num_classes=args.classes, early_stop=False)
        dt = time.time() - t0
    return history, dt


def run_seed(args, seed):
    import torch

    from src.Model_A_OutGridNet import MaxOutNet as RefMaxOutNet

    # identical ported init per seed pair: spread measures data-order +
    # augmentation/mixing RNG, with init controlled
    torch.manual_seed(seed)
    ref_model = RefMaxOutNet(num_classes=args.classes,
                             stages=_ref_stages(_stages()), in_ch=3,
                             stem_dim=16, dpr_max=0.0)
    init_sd = {k: v.clone() for k, v in ref_model.state_dict().items()}

    xtr, ytr, xva, yva = make_data(args, seed)
    print(f"[seed {seed}] data: train {xtr.shape} val {xva.shape} "
          f"classes={args.classes} noise={args.noise}")

    ours_hist, ours_dt = run_ours(args, seed, xtr, ytr, xva, yva, init_sd)
    ref_hist, ref_dt = run_reference(args, seed, xtr, ytr, xva, yva,
                                     ref_model)

    print(f"\n[seed {seed}] | epoch | " + " | ".join(
        f"{k} ours / ref" for k in KEYS) + " |")
    print("|---" * (len(KEYS) + 1) + "|")
    deltas = {k: [] for k in KEYS}
    for e in range(args.epochs):
        row = [f"{e + 1}"]
        for k in KEYS:
            o, r = float(ours_hist[k][e]), float(ref_hist[k][e])
            deltas[k].append(abs(o - r))
            row.append(f"{o:.3f} / {r:.3f}")
        print("| " + " | ".join(row) + " |")
    summary = {k: {"max_abs_delta": max(d),
                   "final_ours": float(ours_hist[k][-1]),
                   "final_ref": float(ref_hist[k][-1])}
               for k, d in deltas.items()}
    print(f"[seed {seed}] max |delta| per series:",
          {k: round(v["max_abs_delta"], 4) for k, v in summary.items()})
    print(f"[seed {seed}] wall: ours {ours_dt:.1f}s | reference {ref_dt:.1f}s")
    return {
        "seed": seed,
        "summary": summary,
        "wall_s": {"ours": ours_dt, "reference": ref_dt},
        "ours": {k: [float(v) for v in ours_hist[k]] for k in KEYS + ("lr",)},
        "reference": {k: [float(v) for v in ref_hist[k]]
                      for k in KEYS + ("lr",)},
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--recipe", choices=["plain", "full"], default="plain")
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--samples", type=int, default=2048)
    p.add_argument("--classes", type=int, default=10)
    p.add_argument("--img", type=int, default=16)
    p.add_argument("--noise", type=float, default=140.0)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--wd", type=float, default=0.05)
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--mix-prob", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--seeds", type=int, nargs="+", default=None,
                   help="multi-seed statistical comparison (full recipe)")
    p.add_argument("--proto-seed", type=int, default=7)
    p.add_argument("--out", type=str,
                   default="docs/evidence/epoch_parity.json")
    args = p.parse_args()

    seeds = args.seeds if args.seeds else [args.seed]
    runs = [run_seed(args, s) for s in seeds]

    payload = {"config": vars(args), "runs": runs}
    if len(runs) > 1:
        # cross-side statistics: is the systematic offset within seed noise?
        stats = {}
        for k in KEYS:
            fo = np.array([r["summary"][k]["final_ours"] for r in runs])
            fr = np.array([r["summary"][k]["final_ref"] for r in runs])
            spread = max(fo.max() - fo.min(), fr.max() - fr.min())
            stats[k] = {
                "final_ours": fo.tolist(), "final_ref": fr.tolist(),
                "mean_ours": float(fo.mean()), "mean_ref": float(fr.mean()),
                "abs_mean_gap": float(abs(fo.mean() - fr.mean())),
                "max_seed_spread": float(spread),
                "gap_within_spread": bool(
                    abs(fo.mean() - fr.mean()) <= max(spread, 1e-9)),
            }
        payload["stats"] = stats
        print("\n=== cross-seed final-epoch statistics ===")
        for k, s in stats.items():
            print(f"{k}: ours {s['mean_ours']:.4f} vs ref {s['mean_ref']:.4f}"
                  f" | gap {s['abs_mean_gap']:.4f} vs seed spread "
                  f"{s['max_seed_spread']:.4f} -> "
                  f"{'OK' if s['gap_within_spread'] else 'GAP'}")
    else:
        payload.update(runs[0])  # single-seed: keep the round-4 schema

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
