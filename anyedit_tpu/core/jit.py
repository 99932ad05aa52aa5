"""jit helpers: keep model parameters TRACED arguments, never constants.

`jax.jit(lambda x: module.apply(params, x))` closure-captures `params`, so
every weight tensor is lowered into the HLO as a *constant*: MLIR lowering
reads each device array back to the host (`ir_constant` → `array._value`)
— one round-trip per tensor per compile, catastrophic on tunneled/remote
backends — the program becomes weight-content-dependent (no executable
reuse across checkpoints), and XLA may constant-fold over the weights at
compile time, exploding compile memory.

`jit_apply(module, params)` binds params as the leading traced argument
of a jitted apply instead: compile once per *shape*, zero weight readback.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax

__all__ = ["jit_apply"]


def jit_apply(module, params, *, method: Optional[Any] = None,
              static_argnames=()):
    """`fn(*args, **kwargs)` ≡ `module.apply(params, *args, **kwargs)`,
    jitted with `params` as a traced (non-constant) leading argument."""
    kw = dict(static_argnames=static_argnames) if static_argnames else {}
    if method is not None:
        f = jax.jit(lambda p, *a, **k: module.apply(p, *a, method=method,
                                                    **k), **kw)
    else:
        f = jax.jit(lambda p, *a, **k: module.apply(p, *a, **k), **kw)
    return functools.partial(f, params)
