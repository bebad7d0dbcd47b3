"""Test configuration: run on a virtual 8-device CPU mesh by default.

Multi-chip sharding logic is validated with
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4); set
``LDT_TEST_TPU=1`` to run the suite on real TPU hardware instead.

Note: the environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon
(the TPU tunnel) before any user code runs, so the platform must be switched
via jax.config, not env vars.
"""
import os

_USE_TPU = os.environ.get("LDT_TEST_TPU", "0") == "1"

if not _USE_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
else:
    # TPU compiles are minutes cold; share the persistent cache the bench
    # and smoke scripts use so repeated runs are seconds
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp"),
    )

jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
