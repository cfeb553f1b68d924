"""Fused outlook-attention kernel vs XLA path (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from outgridvit_tpu.ops.outlook import outlook_aggregate_xla
from outgridvit_tpu.ops.experimental.outlook_pallas import outlook_attention_pallas


def _xla_ref(v, logits, heads, k):
    B, H, W, C = v.shape
    kk = k * k
    a = logits.reshape(B, H, W, heads, kk)
    a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(v.dtype)
    return outlook_aggregate_xla(v, a, kernel_size=k, stride=1)


@pytest.mark.parametrize("B,H,W,C,heads,k", [(4, 8, 8, 8, 2, 3),
                                             (2, 8, 8, 12, 3, 3)])
def test_outlook_pallas_matches_xla(B, H, W, C, heads, k):
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (B, H, W, C), jnp.float32)
    logits = jax.random.normal(jax.random.PRNGKey(1),
                               (B, H, W, heads * k * k), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = outlook_attention_pallas(v, logits, heads, k)
    want = _xla_ref(v, logits, heads, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow  # opt-in kernel; fwd equivalence stays fast
def test_outlook_pallas_grad_matches_xla():
    B, H, W, C, heads, k = 2, 8, 8, 8, 2, 3
    v = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.float32)
    logits = jax.random.normal(jax.random.PRNGKey(1),
                               (B, H, W, heads * k * k), jnp.float32)

    def loss_pal(v, l):
        return (outlook_attention_pallas(v, l, heads, k).astype(jnp.float32)
                ** 2).sum()

    def loss_ref(v, l):
        return (_xla_ref(v, l, heads, k).astype(jnp.float32) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gv1, gl1 = jax.grad(loss_pal, argnums=(0, 1))(v, logits)
    gv2, gl2 = jax.grad(loss_ref, argnums=(0, 1))(v, logits)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv2),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(gl1), np.asarray(gl2),
                               atol=5e-4, rtol=5e-4)
