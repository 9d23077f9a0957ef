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


def pytest_collection_modifyitems(session, config, items):
    """Run the heavy end-to-end files FIRST, on a fresh XLA process.

    XLA:CPU's compiler segfaults (SIGSEGV inside backend_compile_and_load)
    after ~300 programs have been compiled in one process when the big
    fused step+render programs come last — an upstream accumulation bug,
    reproducible at the same collection index in full alphabetical runs
    and absent when the same files run early or alone.  Compiling the
    large programs first sidesteps it without changing any test."""
    heavy = ("test_rollout", "test_multichip", "test_raster_batch",
             "test_level_render")

    def rank(item):
        name = item.module.__name__ if item.module else ""
        for i, h in enumerate(heavy):
            if name.endswith(h):
                return (0, i)
        return (1, 0)

    items.sort(key=rank)
