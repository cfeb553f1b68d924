"""Epoch-scale convergence parity vs the ACTUAL PyTorch reference code.

Extends the 8-step trajectory parity (tests/test_torch_parity.py) to epoch
scale: train the reference's own `MaxOutNet` + `train_model`
(/root/reference/src/training/train_full_model.py:24-305) and this
framework's `train_model` (outgridvit_tpu/training/loop.py) on the SAME
synthetic structured dataset, from PORTED IDENTICAL initial weights, with
the same recipe (label-smoothed CE, masked AdamW, warmup-cosine, clip 1.0),
and compare per-epoch train/val curves. At this scale any drift in the LR
schedule, BN momentum, weight-decay masking, or metric accounting would
show up as diverging curves; batch order is the only uncontrolled
difference (each side shuffles with its own RNG), so curves are expected to
match within that noise, not bit-for-bit.

Runs on CPU (both sides) by design: identical hardware numerics, and the
torch reference has no TPU path. Usage:

    python scripts/epoch_parity.py --epochs 12 --out docs/evidence/epoch_parity.json
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

MEAN, STD = 0.5, 0.25  # plain normalization; augmentation off on both sides


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


def make_data(args):
    from outgridvit_tpu.data.datasets import synth_structured_arrays

    xtr, ytr = synth_structured_arrays(
        args.samples, img_size=args.img, num_classes=args.classes,
        seed=args.seed, noise=args.noise, proto_seed=args.seed)
    xva, yva = synth_structured_arrays(
        max(512, args.samples // 4), img_size=args.img,
        num_classes=args.classes, seed=args.seed + 1, noise=args.noise,
        proto_seed=args.seed)
    norm = lambda x: ((x.astype(np.float32) / 255.0) - MEAN) / STD
    return norm(xtr), ytr, norm(xva), yva


def run_ours(args, xtr, ytr, xva, yva, init_state_dict):
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

    train_loader = ArrayDataLoader(xtr, ytr, batch_size=args.batch,
                                   shuffle=True, seed=args.seed,
                                   num_threads=1)
    val_loader = ArrayDataLoader(xva, yva, batch_size=args.batch,
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
            mixup_alpha=0.0, cutmix_alpha=0.0,
            num_classes=args.classes, early_stop=False, seed=args.seed,
            state=state)
        dt = time.time() - t0
    return history, dt


def run_reference(args, xtr, ytr, xva, yva, ref_model):
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    from src.training.train_full_model import train_model as ref_train_model

    def to_nchw(x):
        return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

    g = torch.Generator().manual_seed(args.seed)
    train_loader = DataLoader(
        TensorDataset(to_nchw(xtr), torch.from_numpy(ytr)),
        batch_size=args.batch, shuffle=True, generator=g)
    val_loader = DataLoader(
        TensorDataset(to_nchw(xva), torch.from_numpy(yva)),
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
            mixup_alpha=0.0, cutmix_alpha=0.0,
            num_classes=args.classes, early_stop=False)
        dt = time.time() - t0
    return history, dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--samples", type=int, default=2048)
    p.add_argument("--classes", type=int, default=10)
    p.add_argument("--img", type=int, default=16)
    p.add_argument("--noise", type=float, default=140.0)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--wd", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--out", type=str, default="docs/evidence/epoch_parity.json")
    args = p.parse_args()

    import torch

    from src.Model_A_OutGridNet import MaxOutNet as RefMaxOutNet

    torch.manual_seed(0)
    ref_model = RefMaxOutNet(num_classes=args.classes,
                             stages=_ref_stages(_stages()), in_ch=3,
                             stem_dim=16, dpr_max=0.0)
    init_sd = {k: v.clone() for k, v in ref_model.state_dict().items()}

    xtr, ytr, xva, yva = make_data(args)
    print(f"data: train {xtr.shape} val {xva.shape} classes={args.classes} "
          f"noise={args.noise}")

    ours_hist, ours_dt = run_ours(args, xtr, ytr, xva, yva, init_sd)
    ref_hist, ref_dt = run_reference(args, xtr, ytr, xva, yva, ref_model)

    keys = ("train_loss", "train_top1", "val_loss", "val_top1")
    print("\n| epoch | " + " | ".join(
        f"{k} ours / ref" for k in keys) + " |")
    print("|---" * (len(keys) + 1) + "|")
    deltas = {k: [] for k in keys}
    for e in range(args.epochs):
        row = [f"{e + 1}"]
        for k in keys:
            o, r = float(ours_hist[k][e]), float(ref_hist[k][e])
            deltas[k].append(abs(o - r))
            row.append(f"{o:.3f} / {r:.3f}")
        print("| " + " | ".join(row) + " |")
    summary = {k: {"max_abs_delta": max(d), "final_ours": float(ours_hist[k][-1]),
                   "final_ref": float(ref_hist[k][-1])}
               for k, d in deltas.items()}
    print("\nmax |delta| per series:",
          {k: round(v["max_abs_delta"], 4) for k, v in summary.items()})
    print(f"wall: ours {ours_dt:.1f}s | reference {ref_dt:.1f}s")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "config": vars(args),
        "summary": summary,
        "wall_s": {"ours": ours_dt, "reference": ref_dt},
        "ours": {k: [float(v) for v in ours_hist[k]] for k in keys + ("lr",)},
        "reference": {k: [float(v) for v in ref_hist[k]]
                      for k in keys + ("lr",)},
    }
    out.write_text(json.dumps(payload, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
