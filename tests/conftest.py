"""Test configuration: run on a virtual 8-device CPU mesh.

Tests validate semantics on CPU (fast, deterministic, no TPU needed); the
TPU-specific numerics (int64 emulation, exactf correct rounding) were
validated on hardware and are exercised by bench.py on the real chip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
