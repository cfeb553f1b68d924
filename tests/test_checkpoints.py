"""Checkpoint save/load semantics (reference `src/training/chekpoints.py`):
full-state roundtrip, metadata, and the eval-only variables restore that
must work across optimizer-tree changes."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from outgridvit_tpu.training.checkpoints import (
    load_checkpoint,
    load_model_variables,
    save_checkpoint,
)
from outgridvit_tpu.training.train_state import TrainState


def _make_state(tx):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    return TrainState.create(apply_fn=None, params=params,
                             batch_stats={"m": jnp.full((3,), 0.5)}, tx=tx)


def test_roundtrip_full_state(tmp_path):
    state = _make_state(optax.chain(optax.clip_by_global_norm(1.0),
                                    optax.adamw(1e-3)))
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
    state = state.replace(params=optax.apply_updates(state.params, updates),
                          opt_state=opt_state, step=state.step + 1)
    p = tmp_path / "ck.msgpack"
    save_checkpoint(str(p), state, epoch=3, best_top1=12.5)

    fresh = _make_state(optax.chain(optax.clip_by_global_norm(1.0),
                                    optax.adamw(1e-3)))
    out = load_checkpoint(str(p), fresh)
    assert out["epoch"] == 3 and out["best_top1"] == 12.5
    restored = out["state"]
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_load_model_variables_ignores_optimizer_tree(tmp_path):
    # trained with chain(clip, adamw); restored by an eval CLI that built a
    # bare sgd — must still work (found live: the robustness CLI failed on
    # the optimizer namedtuple mismatch before this helper existed)
    state = _make_state(optax.chain(optax.clip_by_global_norm(1.0),
                                    optax.adamw(1e-3)))
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
    state = state.replace(params=optax.apply_updates(state.params, updates),
                          opt_state=opt_state, step=state.step + 1)
    p = tmp_path / "ck.msgpack"
    save_checkpoint(str(p), state, epoch=1, best_top1=1.0)

    fresh = _make_state(optax.sgd(0.1))
    variables = {"params": fresh.params, "batch_stats": fresh.batch_stats}
    out = load_model_variables(str(p), variables)
    for a, b in zip(jax.tree_util.tree_leaves(out["params"]),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(out["batch_stats"]["m"]),
                                  np.asarray(state.batch_stats["m"]))
