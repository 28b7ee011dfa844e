"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers a remote-TPU (axon) PJRT plugin and
forces the platform at interpreter start, so env vars alone don't stick —
we must override via jax.config BEFORE any backend is initialized (this
conftest imports before all test modules).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # never let tests ride the TPU tunnel
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules. A full-suite run
    accumulates hundreds of CPU-backend programs; past ~180 the XLA CPU
    compiler segfaulted reproducibly (backend_compile_and_load) — clearing
    per module keeps the live-executable population bounded. No subset of
    the suite reproduces the crash, so this is a mitigation for the
    long-lived-process case, not a code bug workaround."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
