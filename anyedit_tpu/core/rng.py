"""Deterministic RNG threading.

The reference seeds `random.randint` ad hoc throughout its accept/reject
loops, so dataset composition is irreproducible across runs. Here every
stochastic decision derives from one root `jax.random.key` folded with a
stable record key, so a factory run is a pure function of (seed, records).
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np


def record_key(root_seed: int, record_id: str) -> jax.Array:
    """A per-record PRNG key: fold a stable hash of the record id into the root."""
    h = int.from_bytes(hashlib.sha256(record_id.encode()).digest()[:4], "little")
    return jax.random.fold_in(jax.random.key(root_seed), h)


def host_rng(root_seed: int, record_id: str) -> np.random.Generator:
    """A numpy Generator for host-side choices (word templates, jitter)."""
    h = hashlib.sha256(f"{root_seed}:{record_id}".encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "little"))
