"""Test configuration: force the 8-virtual-device CPU backend.

Tests model the multi-chip TPU mesh on a CPU host
(`--xla_force_host_platform_device_count=8`), per the reference test
strategy of deterministic single-process tests (ref: test/main.cpp) extended
with SPMD sharding checks the reference has no analog for.
"""
import os

os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_force_host_platform_device_count=8",
)
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

# The container's sitecustomize pre-imports jax with the axon TPU platform
# pinned; switch to CPU post-import (env vars alone are too late).
# PTX_TPU_TESTS=1 keeps the real chip attached instead — the escape hatch
# for the hardware smoke suite: `PTX_TPU_TESTS=1 pytest -m tpu`.
if os.environ.get("PTX_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite compiles hundreds of programs;
# caching cuts repeat runs ~20% (tracing and interpret-mode Pallas are the
# rest and are not cacheable).
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
