#!/usr/bin/env python
"""Train Outlook-Grid models on TPU.

Same CLI surface and YAML schema as the reference trainer
(`/root/reference/scripts/train.py:135-186`): the reference's configs load
unchanged. `--device` maps onto jax platforms (tpu|cpu).
"""

import argparse
import os
import sys
from pathlib import Path

import yaml

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def load_yaml(path: Path) -> dict:
    with path.open("r", encoding="utf-8") as f:
        return yaml.safe_load(f) or {}


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Train Outlook-Grid models (TPU)")
    parser.add_argument("--config", default="configs/train.yaml", help="Path to YAML config")
    parser.add_argument("--model", choices=["a", "b", "model_a", "model_b"], help="Override model type")
    parser.add_argument("--device", help="Override runtime device (tpu|cpu)")
    parser.add_argument("--epochs", type=int, help="Override training epochs")
    parser.add_argument("--batch-size", type=int, help="Override batch size")
    parser.add_argument("--data-dir", help="Override dataset root")
    parser.add_argument("--num-workers", type=int, help="Override dataloader workers")
    parser.add_argument("--img-size", type=int, help="Override input image size")
    parser.add_argument("--val-split", type=float, help="Override val split (0..1)")
    parser.add_argument("--output-dir", help="Override output directory")
    parser.add_argument("--resume", help="Path to resume checkpoint")
    parser.add_argument("--no-amp", action="store_true", help="Disable mixed precision (use fp32)")
    parser.add_argument("--seed", type=int, help="Override random seed")
    parser.add_argument("--mesh", help="Device mesh as data,model (e.g. '4,2')")
    parser.add_argument(
        "--device-augment", choices=["auto", "on", "off"], default="auto",
        help="run the train augmentation recipe in-jit on device (auto: on "
             "for accelerator backends, off on CPU)")
    parser.add_argument(
        "--steps-per-dispatch", type=int, default=None,
        help="scan K train steps per dispatched XLA program (amortizes host "
             "round trips; default: 8 on accelerator backends, 1 on CPU)")
    # multi-process / multi-host execution (SURVEY §5): one launched
    # process per host, same flags everywhere except --dist-process-id.
    # Defaults also come from OUTGRIDVIT_COORDINATOR / _NUM_PROCESSES /
    # _PROCESS_ID so cluster launchers can configure via environment.
    parser.add_argument(
        "--dist-coordinator", default=None,
        help="host:port of process 0's coordination service "
             "(enables jax.distributed multi-process execution)")
    parser.add_argument(
        "--dist-num-processes", type=int, default=None,
        help="total number of processes in the distributed run")
    parser.add_argument(
        "--dist-process-id", type=int, default=None,
        help="this process's id in [0, num_processes)")
    parser.add_argument(
        "--history-out", default=None,
        help="pickle the training history dict after the run (the "
             "reference's notebooks pickle the same dict into "
             "experiments_results/Convergance/; utils/history.py loads it)")
    return parser.parse_args()


def main() -> int:
    args = parse_args()
    cfg = load_yaml(Path(args.config))

    model_cfg = cfg.get("model", {})
    data_cfg = cfg.get("data", {})
    train_cfg = cfg.get("training", {})
    runtime_cfg = cfg.get("runtime", {})

    if args.model:
        model_cfg["type"] = args.model
    if args.epochs is not None:
        train_cfg["epochs"] = args.epochs
    if args.batch_size is not None:
        data_cfg["batch_size"] = args.batch_size
    if args.data_dir is not None:
        data_cfg["data_dir"] = args.data_dir
    if args.num_workers is not None:
        data_cfg["num_workers"] = args.num_workers
    if args.img_size is not None:
        data_cfg["img_size"] = args.img_size
    if args.val_split is not None:
        data_cfg["val_split"] = args.val_split
    if args.device is not None:
        runtime_cfg["device"] = args.device
    if args.output_dir is not None:
        runtime_cfg["output_dir"] = args.output_dir
    if args.resume is not None:
        train_cfg["resume_path"] = args.resume
    if args.no_amp:
        train_cfg["use_amp"] = False
    if args.seed is not None:
        runtime_cfg["seed"] = args.seed

    device = str(runtime_cfg.get("device", "tpu")).lower()
    if device in ("cpu",):
        import jax

        jax.config.update("jax_platforms", "cpu")
    elif device in ("cuda", "tpu", "auto", ""):
        pass  # jax picks the best available backend

    # multi-process bring-up must precede any jax backend initialization
    from outgridvit_tpu.parallel.distributed import (
        initialize as initialize_distributed,
        is_main_process,
        shard_loader_for_process,
        warmup_collectives,
    )

    initialize_distributed(
        coordinator_address=args.dist_coordinator,
        num_processes=args.dist_num_processes,
        process_id=args.dist_process_id,
    )
    import jax  # noqa: E402  (after platform selection + dist init)

    if jax.process_count() > 1:
        warmup_collectives()

    if "device_augment" not in data_cfg:
        if args.device_augment == "auto":
            data_cfg["device_augment"] = jax.default_backend() != "cpu"
        else:
            data_cfg["device_augment"] = args.device_augment == "on"
    elif args.device_augment != "auto":
        data_cfg["device_augment"] = args.device_augment == "on"

    if args.steps_per_dispatch is not None:
        train_cfg["steps_per_dispatch"] = args.steps_per_dispatch
    if "steps_per_dispatch" not in train_cfg:
        train_cfg["steps_per_dispatch"] = (
            8 if jax.default_backend() != "cpu" else 1)

    # persistent compilation cache: repeated runs of the same config skip
    # the (minutes-long over a remote link) XLA compile
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("OUTGRIDVIT_JAX_CACHE", "/tmp/outgridvit_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from outgridvit_tpu.data import build_dataloaders
    from outgridvit_tpu.models import build_model
    from outgridvit_tpu.parallel import make_mesh
    from outgridvit_tpu.training import train_model

    seed = int(runtime_cfg.get("seed", 7))

    output_dir = Path(runtime_cfg.get("output_dir", "outputs"))
    output_dir.mkdir(parents=True, exist_ok=True)

    model = build_model(model_cfg)
    num_classes = int(model_cfg.get("num_classes", 100))

    train_loader, val_loader, _ = build_dataloaders(data_cfg, num_classes, seed=seed)
    if jax.process_count() > 1:
        # per-host input pipelines (SURVEY §5): each process yields only
        # its own rows of every global batch; the Prefetcher assembles the
        # global arrays via make_array_from_process_local_data
        train_loader = shard_loader_for_process(train_loader)
        val_loader = shard_loader_for_process(val_loader)

    save_path = Path(train_cfg.get("save_path", "best_model.ckpt"))
    last_path = Path(train_cfg.get("last_path", "last_model.ckpt"))
    if not save_path.is_absolute():
        save_path = output_dir / save_path
    if not last_path.is_absolute():
        last_path = output_dir / last_path

    mesh = None
    if args.mesh:
        shape = tuple(int(x) for x in args.mesh.split(","))
        mesh = make_mesh(shape)

    history, _ = train_model(
        model=model,
        train_loader=train_loader,
        epochs=int(train_cfg.get("epochs", 1)),
        val_loader=val_loader,
        device=device,
        lr=float(train_cfg.get("lr", 5e-4)),
        weight_decay=float(train_cfg.get("weight_decay", 0.05)),
        autocast_dtype=str(train_cfg.get("autocast_dtype", "bf16")),
        use_amp=bool(train_cfg.get("use_amp", True)),
        grad_clip_norm=train_cfg.get("grad_clip_norm", 1.0),
        warmup_ratio=float(train_cfg.get("warmup_ratio", 0.05)),
        min_lr=float(train_cfg.get("min_lr", 0.0)),
        label_smoothing=float(train_cfg.get("label_smoothing", 0.1)),
        print_every=int(train_cfg.get("print_every", 100)),
        save_path=str(save_path),
        last_path=str(last_path),
        resume_path=train_cfg.get("resume_path", None),
        mixup_alpha=float(train_cfg.get("mixup_alpha", 0.0)),
        cutmix_alpha=float(train_cfg.get("cutmix_alpha", 0.0)),
        mix_prob=float(train_cfg.get("mix_prob", 1.0)),
        num_classes=num_classes,
        channels_last=bool(train_cfg.get("channels_last", False)),
        early_stop=bool(train_cfg.get("early_stop", True)),
        early_stop_metric=str(train_cfg.get("early_stop_metric", "top1")),
        early_stop_patience=int(train_cfg.get("early_stop_patience", 10)),
        early_stop_min_delta=float(train_cfg.get("early_stop_min_delta", 0.0)),
        early_stop_require_monotonic=bool(
            train_cfg.get("early_stop_require_monotonic", False)
        ),
        seed=seed,
        mesh=mesh,
        steps_per_dispatch=int(train_cfg.get("steps_per_dispatch", 1)),
    )

    if is_main_process():
        if args.history_out:
            from outgridvit_tpu.utils.history import save_history

            save_history(history, args.history_out)
            print(f"History saved to {args.history_out}")
        print("Training complete. History keys:", sorted(history.keys()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
