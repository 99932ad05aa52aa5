"""Persistent-compile-cache helpers.

XLA:CPU AOT executables are machine-specific: loading a cache entry
written on a host with different vector extensions mis-executes silently
(observed: NaN logits + SIGILL warnings when an AMX-host cache was
loaded on a non-AMX host — tests/conftest.py first hit this; the bench
tools hit it again in round 4 when the execution host changed between
runs). Key every cache directory by a CPU-feature fingerprint so a
foreign-host cache is simply a miss. TPU executables are keyed by the
compile service and are unaffected either way.
"""

from __future__ import annotations

import hashlib
import os


def cpu_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(l for l in f if l.startswith("flags"))
    except (OSError, StopIteration):
        import platform
        flags = platform.processor() or "unknown"
    return hashlib.sha1(flags.encode()).hexdigest()[:8]


def enable_persistent_cache(root: str, name: str = ".jax_bench_cache",
                            min_compile_secs: float = 1.0) -> str:
    """Point jax's compilation cache at `<root>/<name>-<cpu_tag>`."""
    import jax

    path = os.path.join(root, f"{name}-{cpu_tag()}")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
