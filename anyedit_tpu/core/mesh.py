"""Device-mesh construction and sharding helpers.

One mesh abstraction replaces all four parallelism mechanisms of the
reference (SURVEY.md §2g): shell-script data sharding, HF-Accelerate DDP,
manual cuda:0/cuda:1 model placement, and CPU offload.

Axes:
  dp — data parallel (batch of instruction records / training batch)
  tp — tensor parallel (attention heads / MLP columns of the big nets)
  ep — expert parallel (AnySD MoE adapter experts)

On a v5e-8 slice the default is (dp=2, tp=2, ep=2); on one chip everything
collapses to trivial axes. Collectives ride ICI via jax.lax psum/all_gather
inserted by XLA from the sharding annotations — never hand-written NCCL.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "tp", "ep")


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    dp: int = 1
    tp: int = 1
    ep: int = 1

    @property
    def size(self) -> int:
        return self.dp * self.tp * self.ep

    @classmethod
    def auto(cls, n_devices: int | None = None,
             want_tp: bool = True, want_ep: bool = True) -> "MeshSpec":
        """Factor the device count into (dp, tp, ep), biasing leftovers to dp."""
        n = n_devices if n_devices is not None else jax.device_count()
        tp = 1
        ep = 1
        if want_tp and n % 2 == 0:
            tp = 2
            n //= 2
        if want_ep and n % 2 == 0:
            ep = 2
            n //= 2
        return cls(dp=n, tp=tp, ep=ep)


def make_mesh(spec: MeshSpec | None = None,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    spec = spec or MeshSpec.auto(len(devices))
    if spec.size != len(devices):
        raise ValueError(f"mesh spec {spec} needs {spec.size} devices, have {len(devices)}")
    arr = np.array(devices).reshape(spec.dp, spec.tp, spec.ep)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(MeshSpec(), devices=jax.devices()[:1])


# ---- common shardings ----------------------------------------------------

def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over dp (leading dim)."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of host arrays with batch-dim sharded over dp."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)
