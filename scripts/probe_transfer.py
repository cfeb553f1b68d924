#!/usr/bin/env python
"""Measure the host->device transfer ceiling for eval-sized batches.

The eval epoch is transfer-bound on the tunneled dev link
(docs/PERFORMANCE.md): this probe separates the LINK's ceiling from the
pipeline's overhead so "eval throughput" can be judged against what the
wire physically allows. It times:

1. bare ``jax.device_put`` of eval wire batches (uint8 [B, H, W, 3]),
   back-to-back, N at a time before a sync — the raw H2D ceiling;
2. the same with a trivial jitted consumer (sum) — put + dispatch overlap;
3. float32 wire for comparison (the 4x penalty the uint8 wire avoids).

Prints one JSON line per mode: {mode, batch, imgs_per_s, gib_per_s}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--img", type=int, default=32)
    ap.add_argument("--batches", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    B, S = args.batch, args.img
    rng = np.random.default_rng(0)

    host_u8 = [rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
               for _ in range(8)]
    host_f32 = [b.astype(np.float32) / 255.0 for b in host_u8]

    consume = jax.jit(lambda x: jnp.sum(x, dtype=jnp.float32))

    def run(mode, batches):
        nbytes = batches[0].nbytes
        best = 0.0
        for _ in range(args.reps):
            # warm
            jax.block_until_ready(jax.device_put(batches[0], dev))
            t0 = time.perf_counter()
            if mode.endswith("+consume"):
                outs = []
                for i in range(args.batches):
                    xb = jax.device_put(batches[i % 8], dev)
                    outs.append(consume(xb))
                float(outs[-1])  # hard sync through the chain
                for o in outs:
                    float(o)
            else:
                last = None
                for i in range(args.batches):
                    last = jax.device_put(batches[i % 8], dev)
                np.asarray(last).ravel()[0]  # force the full queue to land
            dt = time.perf_counter() - t0
            rate = args.batches * B / dt
            best = max(best, rate)
        print(json.dumps({
            "mode": mode, "batch": B, "img": S,
            "imgs_per_s": round(best, 1),
            "gib_per_s": round(best / B * nbytes / 2**30, 3),
        }))

    run("uint8_put", host_u8)
    run("uint8_put+consume", host_u8)
    run("float32_put", host_f32)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
