"""Test harness: force an 8-device virtual CPU mesh before jax import.

Mirrors how the driver validates multi-chip sharding without real chips.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env so the flag takes effect)

# The image's sitecustomize registers the axon TPU backend before conftest
# runs, so the env var alone is not enough — force the platform via config.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from anyedit_tpu.core.mesh import make_mesh, MeshSpec
    return make_mesh(MeshSpec(dp=2, tp=2, ep=2))
