"""Test configuration: run on a virtual 8-device CPU mesh.

Tests validate semantics on CPU (fast, deterministic, no TPU needed); the
TPU-specific numerics (int64 emulation, exactf correct rounding) were
validated on hardware and are exercised by bench.py on the real chip.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: the env var JAX_PLATFORMS is ignored under the axon TPU plugin; the
# config update is honored.  Set B32_TEST_PLATFORM=tpu to run tests on the
# real chip instead of the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", os.environ.get("B32_TEST_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)
