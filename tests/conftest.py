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

# Persistent compilation cache: the suite is compile-bound on this image's
# single CPU core (the big tiny-zoo integration tests alone re-jit dozens of
# programs). First run populates; subsequent runs cut minutes to seconds.
_cache = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                      ".jax_test_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from anyedit_tpu.core.mesh import make_mesh, MeshSpec
    return make_mesh(MeshSpec(dp=2, tp=2, ep=2))
