"""Layout-pin knob (ops/layout_pin.py): off by default, identity off-TPU,
and a real jax.experimental.layout constraint when enabled on "tpu".

The constraint itself is backend-agnostic (XLA layout custom-call), so the
enabled path is exercised here on CPU by faking the backend name — the
throughput question (does pinning help?) is settled on-chip by the
campaign A/B (docs/evidence/campaign_r5/), not here.
"""

import jax
import jax.numpy as jnp
import pytest

from outgridvit_tpu.ops import layout_pin
from outgridvit_tpu.ops.layout_pin import pin_default, pin_enabled


def test_off_by_default(monkeypatch):
    monkeypatch.delenv("OUTGRIDVIT_PIN_LAYOUT", raising=False)
    assert not pin_enabled()
    x = jnp.ones((4, 8))
    assert pin_default(x) is x


@pytest.mark.parametrize("val,expect", [("1", True), ("true", True),
                                        ("0", False), ("", False)])
def test_flag_parsing(monkeypatch, val, expect):
    monkeypatch.setenv("OUTGRIDVIT_PIN_LAYOUT", val)
    assert pin_enabled() is expect


def test_identity_off_tpu(monkeypatch):
    monkeypatch.setenv("OUTGRIDVIT_PIN_LAYOUT", "1")
    x = jnp.ones((4, 8))
    # CPU backend: the pin is a no-op by design.
    assert pin_default(x) is x


def test_constraint_applies_and_is_exact(monkeypatch):
    monkeypatch.setenv("OUTGRIDVIT_PIN_LAYOUT", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def f(x):
        # grid_partition-shaped 6-D transpose feeding the pin, like the
        # wiring in models/blocks.py.
        y = jnp.transpose(x.reshape(2, 4, 2, 8, 2, 8),
                          (0, 2, 4, 1, 3, 5)).reshape(8, 32, 8)
        y = pin_default(y)
        return (y * y).sum()

    x = jnp.arange(2 * 8 * 16 * 8, dtype=jnp.float32).reshape(2, 8, 16, 8)
    got = jax.jit(f)(x)
    assert got == pytest.approx(float((x * x).sum()), rel=1e-6)
    # differentiable (identity gradient)
    g = jax.jit(jax.grad(f))(x)
    assert jnp.allclose(g, 2.0 * x)


def test_model_forward_unchanged_by_flag(monkeypatch):
    """Wiring guard: tracing the attention block with the pin enabled (and a
    faked tpu backend so the constraint is live) must not change values."""
    monkeypatch.setenv("OUTGRIDVIT_PIN_LAYOUT", "1")

    from outgridvit_tpu.models.blocks import GridAttention2D

    mod = GridAttention2D(dim=16, num_heads=2, grid_size=2,
                          use_pallas=False, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    params = mod.init(jax.random.PRNGKey(1), x)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with_pin = jax.jit(lambda p, x: mod.apply(p, x))(params, x)
    monkeypatch.setenv("OUTGRIDVIT_PIN_LAYOUT", "0")
    without = jax.jit(lambda p, x: mod.apply(p, x))(params, x)
    assert jnp.allclose(with_pin, without, atol=1e-6)
