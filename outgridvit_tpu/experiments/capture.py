"""Attention capture without forward hooks.

The reference registers torch forward hooks on attention conv / MHSA modules
(`src/experiments/heat_map_att_outlooker.py:12-53`,
`heat_map_att_grid.py:38-87`). JAX has no hooks; the models instead ``sow``
their attention tensors into the "intermediates" collection when called with
``capture=True``. This module runs one forward and normalizes the collection
into the same keyed structure the reference capturers expose:

  {(stage, block): {
      "outlook_logits": [B, Hs, Ws, heads, K*K]   (pre-softmax),
      "grid_attn":      [B*g*g, heads, N, N]      (post-softmax, pre-dropout),
      "grid_hw": (Hg, Wg), "g": int, "meta": (B, Hf, Wf, C, g),
  }}

Model B's front outlookers are keyed ("front", i).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
import numpy as np


def _walk(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, prefix + (k,))
    elif isinstance(tree, (tuple, list)):
        # sow stores tuples of values; take the first (single forward)
        yield prefix, tree[0] if len(tree) == 1 else tree
    else:
        yield prefix, tree


def capture_attention(model, variables, x, grid_sizes=None) -> Dict[Tuple, dict]:
    """Run one forward with capture and key the results by (stage, block).

    Args:
      model: MaxOutNet / OutlookerFrontGridNet module.
      variables: {"params": ..., "batch_stats": ...}.
      x: input batch [B, H, W, 3].
      grid_sizes: optional {stage_idx: g}; defaults to the model's stage cfgs.
    Returns: dict keyed (stage:int|"front", block:int).
    """
    # jit the capture forward: eager apply dispatches every op separately,
    # which is minutes (not seconds) over a tunneled/remote device
    import jax

    @jax.jit
    def _fwd(variables, x):
        return model.apply(
            variables, x, train=False, capture=True,
            mutable=["intermediates"])

    _, aux = _fwd(variables, x)
    inter = jax.device_get(aux["intermediates"])

    if grid_sizes is None:
        grid_sizes = {
            si: scfg.grid_size for si, scfg in enumerate(model.stages)
        }

    out: Dict[Tuple, dict] = {}

    def ensure(key):
        return out.setdefault(
            key, {"outlook_logits": None, "grid_attn": None,
                  "grid_hw": None, "g": None, "meta": None}
        )

    for path, leaf in _walk(inter):
        name = "/".join(str(p) for p in path)
        m = re.match(r"stages_(\d+)_(\d+)/", name)
        key = None
        if m:
            key = (int(m.group(1)), int(m.group(2)))
        else:
            mf = re.match(r"front_(\d+)/", name)
            if mf:
                key = ("front", int(mf.group(1)))
        if key is None:
            continue
        arr = np.asarray(leaf)
        slot = ensure(key)
        if name.endswith("outlook_logits"):
            slot["outlook_logits"] = arr  # [B, Hs, Ws, heads, kk]
        elif name.endswith("attn"):
            slot["grid_attn"] = arr  # [Bgrp, heads, N, N]

    B = x.shape[0]
    for key, slot in out.items():
        if slot["grid_attn"] is not None and isinstance(key[0], int):
            g = grid_sizes[key[0]]
            Bgrp, _, N, _ = slot["grid_attn"].shape
            assert Bgrp % (g * g) == 0, (Bgrp, g)
            # token grids are square for square inputs; recover Hg, Wg
            hg = int(round(np.sqrt(N)))
            while N % hg != 0:
                hg -= 1
            Hg, Wg = hg, N // hg
            Hf, Wf = Hg * g, Wg * g
            C = None
            slot["grid_hw"] = (Hg, Wg)
            slot["g"] = g
            slot["meta"] = (Bgrp // (g * g), Hf, Wf, C, g)
    return out
