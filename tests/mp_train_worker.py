"""Worker process for tests/test_distributed.py: run the REAL
``train_model`` loop under ``jax.distributed`` (or single-process when
nproc==1) on a deterministic synthetic dataset and write the resulting
history + a parameter checksum from process 0.

Spawned as: python mp_train_worker.py <pid> <nproc> <port> <outdir>
                 [epochs] [tag] [resume_path]
with JAX_PLATFORMS=cpu and XLA_FLAGS forcing the per-process device count
set by the spawner. ``tag`` keys the checkpoint/result file names (default
"{nproc}p"); ``resume_path`` exercises resume-under-multi-process (the
reference's resume semantics, `train_full_model.py:86-103`, in a world
the reference never had). Not named test_* so pytest does not collect it.
"""

import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outdir = Path(sys.argv[4])
    epochs = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    tag = sys.argv[6] if len(sys.argv) > 6 else f"{nproc}p"
    resume_path = sys.argv[7] if len(sys.argv) > 7 else None

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("OUTGRIDVIT_JAX_CACHE",
                           "/tmp/outgridvit_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from outgridvit_tpu.parallel import (
        initialize_distributed,
        shard_loader_for_process,
        warmup_collectives,
    )

    if nproc > 1:
        initialize_distributed(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
        assert jax.process_count() == nproc
        warmup_collectives()  # establish Gloo context while in lockstep

    import numpy as np

    from outgridvit_tpu.data.datasets import get_synthetic_dataloaders
    from outgridvit_tpu.models import MaxOutNet
    from outgridvit_tpu.stage_config import StageCfg
    from outgridvit_tpu.training import train_model

    train_loader, _, _ = get_synthetic_dataloaders(
        batch_size=8, num_samples=32, img_size=8, num_classes=10, seed=0)
    val_loader, _, _ = get_synthetic_dataloaders(
        batch_size=8, num_samples=16, img_size=8, num_classes=10, seed=1)
    val_loader.shuffle = False
    train_loader = shard_loader_for_process(train_loader)
    val_loader = shard_loader_for_process(val_loader)

    stages = (
        StageCfg(dim=8, depth=1, num_heads=2, grid_size=2, outlook_heads=2,
                 mlp_ratio=2.0, mbconv_expand_ratio=2.0),
    )
    model = MaxOutNet(num_classes=10, stages=stages, stem_dim=8,
                      use_pallas=False)

    history, state = train_model(
        model=model,
        train_loader=train_loader,
        epochs=epochs,
        val_loader=val_loader,
        use_amp=False,
        grad_clip_norm=1.0,
        print_every=0,
        save_path=str(outdir / f"best_{tag}.ckpt"),
        last_path=str(outdir / f"last_{tag}.ckpt"),
        resume_path=resume_path,
        mixup_alpha=0.2,
        cutmix_alpha=1.0,
        mix_prob=0.5,
        num_classes=10,
        early_stop=False,
        seed=0,
    )

    if pid == 0:
        from outgridvit_tpu.parallel.distributed import replicate_to_host

        checksum = float(sum(
            np.abs(np.asarray(replicate_to_host(leaf))).sum()
            for leaf in jax.tree_util.tree_leaves(state.params)))
        (outdir / f"result_{tag}.json").write_text(json.dumps({
            "train_loss": history["train_loss"],
            "val_loss": history["val_loss"],
            "val_top1": history["val_top1"],
            "step": int(state.step),
            "param_checksum": checksum,
            "ckpt_exists": (outdir / f"last_{tag}.ckpt").exists(),
        }))
    else:
        # non-zero processes participate in the collective parts of the
        # checksum too (replicate_to_host may all-gather)
        from outgridvit_tpu.parallel.distributed import replicate_to_host

        for leaf in jax.tree_util.tree_leaves(state.params):
            replicate_to_host(leaf)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
