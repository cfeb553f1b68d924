"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run anywhere (the driver dry-runs multi-chip the same way).

Note: the env var JAX_PLATFORMS is not honored when a TPU plugin registers
itself with higher priority, so we also set the config flag explicitly after
importing jax (before any backend is initialized).
"""

import os
import sys
from pathlib import Path

# Must be set before jax initializes its backends.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against fp32 PyTorch; keep matmuls at full precision
# in the suite (models pick their own compute dtype in production).
jax.config.update("jax_default_matmul_precision", "highest")

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))
