"""Roofline accounting tests: the optimized-HLO HBM-traffic parser.

The cost-model "bytes accessed" excludes materialized intermediates; the
HLO buffer accounting (utils/roofline.py:hlo_hbm_traffic) counts what the
compiled program actually reads/writes at the top level, which is what
bench.py reports as hbm_util_measured.
"""

import jax
import jax.numpy as jnp
import numpy as np

from outgridvit_tpu.utils.roofline import (
    _shape_bytes,
    compiled_hbm_traffic,
    hlo_hbm_traffic,
)


def test_shape_bytes():
    assert _shape_bytes("f32[128,256]{1,0}") == 128 * 256 * 4
    assert _shape_bytes("bf16[8]{0}") == 16
    assert _shape_bytes("pred[]") == 1
    assert _shape_bytes("(f32[2]{0}, u8[3,3]{1,0})") == 8 + 9
    assert _shape_bytes("s32[]") == 4


def test_matmul_traffic_bounds():
    """A jitted matmul's accounted traffic must cover operands + result and
    stay within a small multiple (layout copies are legitimately counted)."""
    f = jax.jit(lambda a, b: a @ b)
    a = jnp.zeros((256, 256), jnp.float32)
    b = jnp.zeros((256, 256), jnp.float32)
    jax.block_until_ready(f(a, b))
    t = compiled_hbm_traffic(f, a, b)
    assert t is not None and t["total_bytes"] is not None
    minimal = 3 * 256 * 256 * 4  # two reads + one write
    assert t["total_bytes"] >= minimal
    assert t["total_bytes"] <= 10 * minimal
    assert t["n_while"] == 0


def test_scan_trip_count_scales_traffic():
    """lax.scan lowers to a while loop; body bytes must be multiplied by
    the trip count the caller knows (bench passes K)."""
    def step(c, _):
        return jnp.tanh(c @ c), None

    def scan_k(c):
        out, _ = jax.lax.scan(step, c, None, length=16)
        return out

    f = jax.jit(scan_k)
    c = jnp.eye(128, dtype=jnp.float32)
    jax.block_until_ready(f(c))
    t1 = compiled_hbm_traffic(f, c, default_trip=1)
    t16 = compiled_hbm_traffic(f, c, default_trip=16)
    assert t1["n_while"] >= 1
    body1 = t1["total_bytes"]
    body16 = t16["total_bytes"]
    # per-iteration body traffic is at least the matmul working set
    per_iter = (body16 - body1) / 15
    assert per_iter >= 2 * 128 * 128 * 4
    # and the 16-trip total is dominated by the body
    assert body16 > 8 * body1 / 2


def test_intermediates_are_counted():
    """A chain that materializes a large intermediate between two
    non-fusable ops must count more traffic than inputs+outputs alone —
    the precise failure mode of cost-model bytes."""
    def f(x, w1, w2):
        h = jnp.tanh(x @ w1)   # [1024, 1024] intermediate
        return h @ w2          # matmuls don't fuse with each other

    jf = jax.jit(f)
    x = jnp.zeros((1024, 1024), jnp.bfloat16)
    w1 = jnp.zeros((1024, 1024), jnp.bfloat16)
    w2 = jnp.zeros((1024, 1024), jnp.bfloat16)
    jax.block_until_ready(jf(x, w1, w2))
    t = compiled_hbm_traffic(jf, x, w1, w2)
    nbytes = 1024 * 1024 * 2
    # io-only accounting would be 4*nbytes; the intermediate adds >= 2 more
    assert t["total_bytes"] >= 6 * nbytes


def test_parser_handles_tuple_results_and_empty():
    assert hlo_hbm_traffic("")["total_bytes"] is None
    txt = """
HloModule m, is_scheduled=true

ENTRY %main.1 (p0: f32[8,8]) -> (f32[8,8], f32[8,8]) {
  %p0 = f32[8,8]{1,0} parameter(0)
  %neg = f32[8,8]{1,0} negate(%p0)
  %exp = f32[8,8]{1,0} exponential(%p0)
  ROOT %t = (f32[8,8]{1,0}, f32[8,8]{1,0}) tuple(%neg, %exp)
}
"""
    t = hlo_hbm_traffic(txt)
    n = 8 * 8 * 4
    assert t["read_bytes"] == 2 * n   # each unary op reads p0
    assert t["write_bytes"] == 2 * n  # tuple is free; two results written
