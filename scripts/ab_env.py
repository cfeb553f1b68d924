#!/usr/bin/env python
"""Same-process alternating A/B of the full train step under an env toggle.

The dev TPU is reached over a tunnel whose effective throughput drifts
between measurement windows (docs/PERFORMANCE.md "Measurement
methodology"), so two separate-process runs of `bench_config.py` can
disagree by more than the effect being measured. This harness removes the
window problem: it builds TWO jitted step functions in ONE process — one
traced with the env var unset, one with it set (kernel dispatch in
`models/layers.py` reads the env at trace time) — then interleaves short
timed legs A,B,A,B,... on the same device-resident data and reports
per-leg rates plus medians.

The benchmarked configuration (model, optimizer, augment recipe,
synthetic batches) comes from bench_config.BenchContext — one code path
shared with `bench_config.py`, so the two scripts cannot drift.

Usage:
  python scripts/ab_env.py --config configs/tinyimagenet200_model_a.yaml \
      --env OUTGRIDVIT_DW_BWD=1 --batch 128 --k 8 --legs 6 --steps 48
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from scripts.bench_config import BenchContext, hard_sync  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--env", required=True,
                    help="KEY=VAL (comma-separated pairs allowed) set "
                    "only for the B-side trace")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--legs", type=int, default=6,
                    help="timed legs PER SIDE, interleaved A,B,A,B,...")
    ap.add_argument("--steps", type=int, default=48,
                    help="single steps per leg")
    ap.add_argument("--img-size", type=int, default=None)
    args = ap.parse_args()
    pairs = []
    for item in args.env.split(","):
        key, _, val = item.partition("=")
        if not val:
            ap.error("--env must be KEY=VAL[,KEY=VAL...]")
        pairs.append((key, val))

    import jax

    from outgridvit_tpu.parallel import batch_sharding, superbatch_sharding
    from outgridvit_tpu.training.steps import (
        make_train_step,
        make_train_superstep,
    )

    ctx = BenchContext(args.config, args.img_size)
    k = max(1, args.k)
    bs = args.batch
    bshard = (superbatch_sharding(ctx.mesh) if k > 1
              else batch_sharding(ctx.mesh))
    bshape = (k, bs) if k > 1 else (bs,)
    batches = ctx.make_batches(bshape, bshard)

    # Two independently-jitted step functions; kernel dispatch reads the
    # env var at TRACE time, i.e. during each side's first (warmup) call —
    # the env is toggled around that call below, after which each side's
    # compiled program is fixed for the timed legs.
    def make():
        return (make_train_superstep(ctx.step_cfg, lr_schedule=ctx.schedule)
                if k > 1 else
                make_train_step(ctx.step_cfg, lr_schedule=ctx.schedule))

    sides = {"A": make(), "B": make()}
    side_env = {"A": False, "B": True}
    states = {name: ctx.fresh_state() for name in sides}

    base = jax.random.PRNGKey(2)
    n_disp = max(1, args.steps // k)
    for name in ("A", "B"):
        saved = {key: os.environ.get(key) for key, _ in pairs}
        for key, val in pairs:
            if side_env[name]:
                os.environ[key] = val
            else:
                os.environ.pop(key, None)
        try:
            t0 = time.perf_counter()
            st, m = sides[name](states[name], batches[0], base)
            states[name] = st
            hard_sync(st, m)
        finally:
            for key, old in saved.items():
                if old is None:
                    os.environ.pop(key, None)
                else:
                    os.environ[key] = old
        print(f"[ab_env] warmup {name} "
              f"({args.env if side_env[name] else 'unset'}) "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    rates = {"A": [], "B": []}
    for leg in range(args.legs):
        for name in ("A", "B"):
            st = states[name]
            fn = sides[name]
            t0 = time.perf_counter()
            for i in range(n_disp):
                st, m = fn(st, batches[i % 4], base)
            hard_sync(st, m)
            dt = time.perf_counter() - t0
            states[name] = st
            r = bs * k * n_disp / dt
            rates[name].append(round(r, 1))
            print(f"[ab_env] leg {leg} {name}: {r:.1f} imgs/s",
                  file=sys.stderr)

    med = {n: statistics.median(v) for n, v in rates.items()}
    print(json.dumps({
        "config": args.config, "env": args.env, "batch": bs, "k": k,
        "rates": rates, "median": med,
        "b_over_a": round(med["B"] / med["A"], 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
