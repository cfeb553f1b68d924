"""Port PyTorch reference weights into this framework's Flax variable tree.

Used by the parity harness (logits must match the reference to <=1e-4,
BASELINE.md north star) and for migrating checkpoints trained with the
reference (`src/Model_A_OutGridNet.py` / `src/Model_B_OutGridNet.py` module
trees) into the TPU framework.

Layout conversions:
- torch Conv2d KxK weight [O, I, kh, kw]  -> flax Conv kernel [kh, kw, I, O]
- torch Conv2d 1x1 weight [O, I, 1, 1]    -> flax Dense kernel [I, O]
  (we implement all 1x1 convs as Dense over the channel axis)
- torch depthwise Conv2d [C, 1, kh, kw]   -> flax kernel [kh, kw, 1, C]
- torch Linear weight [O, I]              -> flax Dense kernel [I, O]
- torch BatchNorm weight/bias/running_*   -> flax scale/bias + batch_stats
- torch LayerNorm weight/bias             -> flax scale/bias
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np
from flax.core import freeze, unfreeze
from flax.traverse_util import flatten_dict, unflatten_dict


def _np(t) -> np.ndarray:
    # copy=True matters: .numpy() returns a VIEW of the torch tensor's
    # memory, and jax-on-CPU can alias numpy buffers zero-copy — a later
    # in-place torch op (e.g. BatchNorm running-stat updates during a
    # train-mode forward) would silently mutate the ported flax arrays.
    try:  # torch tensor
        return np.array(t.detach().cpu().numpy(), copy=True)
    except AttributeError:
        return np.array(t, copy=True)


def _candidates(flax_path: tuple) -> list:
    """Generate candidate torch state_dict key prefixes for a flax path
    (without the leaf name)."""
    segs = list(flax_path)
    # structural renames
    out = []

    def render(segs):
        s = ".".join(segs)
        s = re.sub(r"stages_(\d+)_(\d+)", r"stages.\1.\2", s)
        s = re.sub(r"downs_(\d+)", r"downs.\1", s)
        s = re.sub(r"front_(\d+)", r"front.\1", s)
        return s

    base = render(segs)
    variants = [base]
    # stem: flax stem.conv -> torch stem.stem.0 ; stem.bn.bn -> stem.stem.1
    variants.append(base.replace("stem.conv", "stem.stem.0")
                        .replace("stem.bn.bn", "stem.stem.1"))
    # mbconv sequential indices (conv module is .0, its BN is .1); the conv
    # renames are end-anchored so they never touch the already-renamed BN keys
    v = base
    v = v.replace("expand_bn.bn", "expand.1")
    v = v.replace("depthwise_bn.bn", "depthwise.1")
    v = v.replace("project_bn.bn", "project.1")
    v = re.sub(r"mbconv\.expand$", "mbconv.expand.0", v)
    v = re.sub(r"mbconv\.depthwise$", "mbconv.depthwise.0", v)
    v = re.sub(r"mbconv\.project$", "mbconv.project.0", v)
    variants.append(v)
    # downsample: conv kind (op.0 conv, op.1 bn) and pool kind (op.1 conv, op.2 bn)
    for conv_i, bn_i in ((0, 1), (1, 2)):
        w = re.sub(r"(downs\.\d+)\.conv", rf"\1.op.{conv_i}", base)
        w = re.sub(r"(downs\.\d+)\.bn\.bn", rf"\1.op.{bn_i}", w)
        if w != base:
            variants.append(w)
    # head_norm wrapper: flax head_norm.bn -> torch head_norm
    variants.append(base.replace("head_norm.bn", "head_norm"))
    # plain nn.LayerNorm in torch has no inner module: drop trailing ".ln"
    for v in list(variants):
        if v.endswith(".ln"):
            variants.append(v[: -len(".ln")])
    # dedupe preserving order
    seen = set()
    for v in variants:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


_LEAF_TO_TORCH = {
    "kernel": ["weight"],
    "scale": ["weight"],
    "bias": ["bias"],
    "mean": ["running_mean"],
    "var": ["running_var"],
}


def _convert(torch_w: np.ndarray, flax_leaf: np.ndarray, leaf_name: str) -> np.ndarray:
    tw = _np(torch_w)
    if leaf_name in ("scale", "bias", "mean", "var"):
        return tw.reshape(flax_leaf.shape)
    # kernel
    if tw.ndim == 4 and flax_leaf.ndim == 2:
        # 1x1 conv -> dense
        assert tw.shape[2] == 1 and tw.shape[3] == 1, (
            f"expected 1x1 conv for dense target, got {tw.shape}")
        return tw[:, :, 0, 0].T
    if tw.ndim == 4 and flax_leaf.ndim == 4:
        return tw.transpose(2, 3, 1, 0)
    if tw.ndim == 2 and flax_leaf.ndim == 2:
        return tw.T
    if tw.ndim == 1:
        return tw.reshape(flax_leaf.shape)
    raise ValueError(f"Cannot convert torch {tw.shape} -> flax {flax_leaf.shape}")


def port_torch_state_dict(
    state_dict: Mapping[str, Any],
    variables: Mapping[str, Any],
    strict: bool = True,
) -> Dict[str, Any]:
    """Map a reference-model ``state_dict`` onto a flax ``variables`` template
    (as produced by ``model.init``). Returns new variables with the same
    structure ({"params": ..., "batch_stats": ...})."""
    variables = unfreeze(variables)
    flat = flatten_dict(variables)
    sd = {k: v for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}
    used = set()
    new_flat = {}
    missing = []
    for path, leaf in flat.items():
        collection, *mod_path, leaf_name = path
        torch_key = None
        for prefix in _candidates(tuple(mod_path)):
            for tl in _LEAF_TO_TORCH.get(leaf_name, [leaf_name]):
                cand = f"{prefix}.{tl}" if prefix else tl
                if cand in sd:
                    torch_key = cand
                    break
            if torch_key:
                break
        if torch_key is None:
            missing.append(".".join(map(str, path)))
            new_flat[path] = leaf
            continue
        used.add(torch_key)
        new_flat[path] = jnp.asarray(
            _convert(sd[torch_key], np.asarray(leaf), leaf_name),
            dtype=jnp.asarray(leaf).dtype,
        )
    unused = sorted(set(sd) - used)
    if strict and (missing or unused):
        raise ValueError(
            f"Weight porting mismatch.\n  flax leaves without torch source: "
            f"{missing}\n  torch keys unused: {unused}"
        )
    return unflatten_dict(new_flat)
