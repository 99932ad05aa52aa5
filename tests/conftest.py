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
# The dir is keyed by a CPU-feature fingerprint: XLA:CPU AOT executables are
# machine-specific, and loading a cache written on a host with different
# vector extensions mis-executes silently (observed: NaN logits + SIGILL
# warnings when an AMX-host cache was loaded on a non-AMX host).
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from anyedit_tpu.core.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.path.dirname(os.path.dirname(__file__)),
                        name=".jax_test_cache", min_compile_secs=0.3)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from anyedit_tpu.core.mesh import make_mesh, MeshSpec
    return make_mesh(MeshSpec(dp=2, tp=2, ep=2))


# ---- test tiers ----------------------------------------------------------
# The full suite is compile-bound on this image (≈250 tests, >10 min even
# warm); `-m smoke` selects a genuinely-fast load-bearing subset (measured
# warm-cache wall-clock in README) so the CI loop always finishes. The
# heavyweight integration streams (test_all_edit_types ~8 min,
# test_train_cli ~3.5 min, the quant/eval end-to-ends) run in the full
# tier; test_smoke_pipeline covers the same wiring with 4 representative
# types.
_SMOKE_MODULES = {
    "test_smoke_pipeline",      # representative pipelines end-to-end
    "test_executor",            # ledger / containment / resume
    "test_parallel_edit",       # dp-sharded editor on the virtual mesh
    "test_core", "test_schedulers", "test_filters", "test_instructions",
    "test_edits", "test_zoo", "test_convert_verify",
}

# individually-slow tests demoted out of an otherwise-smoke module
# (each is covered at depth by its full-tier module; smoke keeps the
# fastest representative of the same wiring)
_SMOKE_EXCLUDE = {
    ("test_zoo", "test_ip2p_stepwise_matches_fused"),   # ~64 s warm
    ("test_instructions", "test_composition_record_caption_to_image"),  # ~29 s
    ("test_zoo", "test_grounder_stepwise_matches_monolithic"),          # ~12 s
    ("test_convert_verify", "test_verify_clip_text_parity"),            # ~10 s
    ("test_zoo", "test_ip2p_lcm_mode"),                                 # ~8 s
    ("test_convert_verify", "test_verify_catches_converter_mismap"),    # ~11 s
    ("test_convert_verify", "test_verify_depth_anything_via_hf_renamer"),  # 5-15 s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__
        if mod in _SMOKE_MODULES and \
                (mod, item.name.split("[")[0]) not in _SMOKE_EXCLUDE:
            item.add_marker(pytest.mark.smoke)
