#!/usr/bin/env python
"""Profile the canonical train step and attribute device time to model ops.

Traces a few single steps (K=1 for clean attribution) of the Model A-7M
CIFAR-100 32px train step with ``jax.profiler``, then joins the xplane trace
(per-HLO ``device_duration_ps`` from the "XLA Ops" line) with the compiled
HLO's per-instruction ``op_name`` metadata (the jax scope path), printing
device time grouped by model component (outlooker / mbconv / grid_attn /
mlp / norms / augment / optimizer) and by HLO category.

Usage: python scripts/profile_step.py [--batch 128] [--steps 6]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

# must precede any protobuf import (the plugin's _pb2s predate protoc 3.19)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def build_step(batch_size: int,
               config: str = "configs/cifar100_model_a_7m.yaml",
               img_size: int | None = None):
    import yaml
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("OUTGRIDVIT_JAX_CACHE",
                           "/tmp/outgridvit_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from outgridvit_tpu.models import build_model
    from outgridvit_tpu.ops.augment import AugmentConfig
    from outgridvit_tpu.parallel import batch_sharding, make_mesh, shard_train_state
    from outgridvit_tpu.training.optim import make_optimizer, warmup_cosine_lr
    from outgridvit_tpu.training.steps import StepConfig, make_train_step
    from outgridvit_tpu.training.train_state import TrainState

    cfg = yaml.safe_load((ROOT / config).read_text())
    img = img_size or int(cfg.get("data", {}).get("img_size", 32))
    model = build_model(cfg["model"], dtype=jnp.bfloat16)
    tcfg = cfg["training"]
    mesh = make_mesh()
    schedule = warmup_cosine_lr(float(tcfg["lr"]), 10_000, 500,
                                float(tcfg["min_lr"]))
    tx = make_optimizer(schedule, float(tcfg["weight_decay"]),
                        tcfg.get("grad_clip_norm", 1.0))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1), jnp.zeros((2, img, img, 3), jnp.float32))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx)
    state = shard_train_state(state, mesh)
    aug = AugmentConfig(mean=(0.5071, 0.4867, 0.4408),
                        std=(0.2675, 0.2565, 0.2761), crop_pad=4)
    step_cfg = StepConfig(
        num_classes=int(cfg["model"]["num_classes"]),
        label_smoothing=float(tcfg.get("label_smoothing", 0.1)),
        mixup_alpha=float(tcfg.get("mixup_alpha", 0.8)),
        cutmix_alpha=float(tcfg.get("cutmix_alpha", 1.0)),
        mix_prob=float(tcfg.get("mix_prob", 0.5)),
        grad_clip_norm=tcfg.get("grad_clip_norm", 1.0),
        augment=aug)
    step_fn = make_train_step(step_cfg, lr_schedule=schedule, jit=False)
    bshard = batch_sharding(mesh)
    x = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(0), (batch_size, img, img, 3),
                           0, 255, dtype=jnp.int32).astype(jnp.uint8), bshard)
    y = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(2), (batch_size,), 0, 100),
        bshard)
    jitted = jax.jit(step_fn, donate_argnums=(0,))
    return jitted, state, (x, y)


# jax op_name scopes look like:
#   jit(train_step)/jvp(MaxOutNet)/stages_0/blocks_1/grid_attn/mhsa/qkv/...
_COMPONENT_PATTERNS = [
    ("outlook_attn", re.compile(r"/outlook/attn/|/outlookers_\d+/attn/")),
    ("outlook_rest", re.compile(r"/outlook/|/outlookers_\d+/")),
    ("mbconv", re.compile(r"/mbconv/")),
    ("grid_attn", re.compile(r"/grid_attn/|grid_mhsa|attn_branch|/mhsa/")),
    ("mlp", re.compile(r"/mlp/")),
    ("norms", re.compile(r"/norm\d|/ln/|layer_norm|/bn/|batch_norm")),
    ("stem/head", re.compile(r"/stem/|/head/|/downsample|/classifier")),
    ("augment", re.compile(
        r"augment|rand_?augment|equalize|posterize|solarize|/crop|erasing")),
    ("mixing", re.compile(r"mixup|cutmix|_mix_")),
    ("optimizer/guard", re.compile(
        r"adamw?|scale_by|global_norm|clip|where|transform|add_decayed")),
    ("loss/metrics", re.compile(r"softmax_cross|log_softmax|top_k|accuracy")),
]


def classify(op_name: str) -> str:
    for label, pat in _COMPONENT_PATTERNS:
        if pat.search(op_name):
            return label
    return "other"


def hlo_scope_map(compiled_text: str):
    """instruction name -> op_name metadata, from optimized HLO text."""
    scope = {}
    pat = re.compile(r"%?([\w.\-]+) = .*?metadata=\{.*?op_name=\"([^\"]*)\"")
    for line in compiled_text.splitlines():
        m = pat.search(line)
        if m:
            scope[m.group(1)] = m.group(2)
    return scope


def parse_xplane(logdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    durations = collections.Counter()  # instr name -> ps
    for plane in xspace.planes:
        if not plane.name.startswith("/device:"):
            continue
        sm = {k: v.name for k, v in plane.stat_metadata.items()}
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                if md is None:
                    continue
                dur = ev.duration_ps
                for st in ev.stats:
                    if sm.get(st.metadata_id) == "device_duration_ps":
                        dur = st.uint64_value or st.int64_value
                        break
                durations[md.display_name or md.name] += dur
    return durations


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--config", default="configs/cifar100_model_a_7m.yaml")
    ap.add_argument("--img-size", type=int, default=None)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--logdir", default="/tmp/outgridvit_profile")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--kind", default="",
                    help="comma-separated HLO kind substrings to drill into "
                         "(e.g. 'copy,convert_reduce')")
    args = ap.parse_args()

    import jax

    step_fn, state, batch = build_step(args.batch, args.config, args.img_size)
    rng = jax.random.PRNGKey(3)
    lowered = step_fn.lower(state, batch, rng)
    compiled = lowered.compile()
    hlo_text = compiled.as_text()
    scope = hlo_scope_map(hlo_text)
    print(f"[profile] compiled; {len(scope)} instructions with op_name")

    state, m = step_fn(state, batch, rng)
    jax.device_get(m["loss"])

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    for _ in range(args.steps):
        state, m = step_fn(state, batch, rng)
    jax.device_get(m["loss"])
    jax.profiler.stop_trace()

    durations = parse_xplane(args.logdir)
    total_ps = sum(durations.values())
    if total_ps == 0:
        raise SystemExit("trace parsed but no device XLA-op time found")

    by_component = collections.Counter()
    by_cat = collections.Counter()
    by_scope = collections.Counter()
    for instr, ps in durations.items():
        sc = scope.get(instr, "")
        by_component[classify(sc)] += ps
        by_cat[re.sub(r"[.\d]+$", "", instr)] += ps
        # collapse scope to the leaf module path (drop jit/transform prefixes)
        short = re.sub(r"jit\([^)]*\)/|jvp\([^)]*\)/|transpose\([^)]*\)/", "",
                       sc)
        by_scope[short[:110] or f"<no-scope> {instr[:60]}"] += ps

    def show(counter, title, n=None):
        print(f"\n== {title} (total {total_ps/1e9/args.steps:.2f} ms/step device) ==")
        for key, ps in counter.most_common(n):
            print(f"  {100*ps/total_ps:5.1f}%  {ps/1e9/args.steps:8.3f} ms/step  {key}")

    show(by_component, "by model component")
    show(by_cat, "by HLO op kind", 15)
    show(by_scope, "top scopes", args.top)

    if args.kind:
        # shape of each instruction, from the HLO text (lhs of the "=")
        shape_of = {}
        spat = re.compile(r"%?([\w.\-]+) = (\S+?)\s")
        for line in hlo_text.splitlines():
            m = spat.search(line.strip())
            if m:
                shape_of[m.group(1)] = m.group(2)
        wanted = [k.strip() for k in args.kind.split(",")]
        per_instr = collections.Counter()
        for instr, ps in durations.items():
            kind = re.sub(r"[.\d]+$", "", instr)
            if any(w in kind for w in wanted):
                per_instr[instr] += ps
        print(f"\n== drill-down: kinds {wanted} ==")
        for instr, ps in per_instr.most_common(args.top):
            sc = scope.get(instr, "")
            short = re.sub(
                r"jit\([^)]*\)/|jvp\([^)]*\)/|transpose\([^)]*\)/", "", sc)
            print(f"  {ps/1e9/args.steps:8.3f} ms/step  {instr[:40]:40s} "
                  f"{shape_of.get(instr, '?'):28s} {short[:80]}")


if __name__ == "__main__":
    main()
