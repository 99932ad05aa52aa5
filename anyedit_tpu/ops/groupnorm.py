"""Fused GroupNorm(+SiLU) — the other hot elementwise op of the UNet.

Every ResBlock in the SD UNet does GroupNorm→SiLU→Conv twice
(reference ldm/modules/diffusionmodules/openaimodel.py:162); an unfused
implementation costs three HBM round-trips per activation. The Pallas
kernel does stats + normalize + affine + SiLU in one VMEM pass per image.

Layout: NHWC (TPU-native). Channels = G groups × C/G; stats reduce over
(H·W, C/G) per group.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def group_norm_ref(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   num_groups: int = 32, eps: float = 1e-5,
                   silu: bool = False) -> jnp.ndarray:
    """XLA reference. x: (N, H, W, C)."""
    n, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(n, h * w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, h, w, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


# Scoped-VMEM budget for one grid step: the in/out (1,HW,C) bf16 blocks
# plus ~3 f32 row-chunk temporaries must fit the 16 MiB scoped limit —
# measured blow-up: chunk 512 at the SD up-path concat shape (1024,1920)
# asked 16.88 MiB and the compile failed (2026-08-20 bench.py run).
_VMEM_BUDGET = int(11.5 * 2 ** 20)


def _plan_chunk(hw: int, c: int) -> int | None:
    """Largest power-of-two row chunk (≤512, dividing hw) whose working
    set fits the scoped-VMEM budget; None if even chunk 8 cannot.

    The model charges a FULL-block f32 term on top of the bf16 in/out
    blocks: Mosaic's measured stack for this kernel is chunk-INDEPENDENT
    (16.88 MiB at (1024,1920) with chunk 512 and with chunk 128 — the
    dynamic-slice reads stage a full-block upcast), so shapes where
    8·hw·c bytes exceed the budget must take the XLA path."""
    io = hw * c * (2 + 2 + 4)              # bf16 in + out, f32 staging
    if io >= _VMEM_BUDGET:
        return None
    cap = (_VMEM_BUDGET - io) // (3 * c * 4)  # f32 chunk temporaries
    chunk = 8
    if cap < chunk or hw % chunk:
        return None
    while chunk * 2 <= min(512, cap, hw) and hw % (chunk * 2) == 0:
        chunk *= 2
    return chunk


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int,
               eps: float, silu: bool, chunk: int):
    """One image per grid step; x stays bf16 in VMEM, stats accumulate in
    fp32 over row chunks (fp32 temporaries never exceed one chunk).

    Mosaic can't shape-cast (HW,C)->(HW,G,C/G) for unaligned C/G, so the
    channel→group reduction is a one-hot matmul instead (tiny MXU op).
    """
    hw, c = x_ref.shape[1], x_ref.shape[2]
    cg = c // num_groups
    n_chunks = hw // chunk
    assert hw % chunk == 0, (hw, chunk)

    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    member = (ch // cg == grp).astype(jnp.float32)      # (C, G)

    # TWO VMEM passes for the variance: x is VMEM-resident, so the second
    # read is nearly free, and the one-pass E[x²]−E[x]² form cancels
    # catastrophically in fp32 when |mean| ≫ std (error ~0.02 observed on
    # high-magnitude spatially-flat features — see models/layers.py).
    def accum_mean(i, s1):
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return s1 + jnp.sum(xc, 0, keepdims=True)

    z = jnp.zeros((1, c), jnp.float32)
    s1 = jax.lax.fori_loop(0, n_chunks, accum_mean, z)
    denom = float(hw * cg)
    mean_g = jnp.dot(s1, member, preferred_element_type=jnp.float32) / denom  # (1, G)
    mean_c0 = jnp.dot(mean_g, member.T, preferred_element_type=jnp.float32)   # (1, C)

    def accum_var(i, s2):
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        d = xc - mean_c0
        return s2 + jnp.sum(d * d, 0, keepdims=True)

    s2 = jax.lax.fori_loop(0, n_chunks, accum_var, z)
    var_g = jnp.dot(s2, member, preferred_element_type=jnp.float32) / denom
    inv_g = jax.lax.rsqrt(var_g + eps)
    inv_c = jnp.dot(inv_g, member.T, preferred_element_type=jnp.float32)
    a = inv_c * scale_ref[:].astype(jnp.float32)                               # (1, C)
    b = bias_ref[:].astype(jnp.float32) - mean_c0 * a

    def write(i, _):
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xc * a + b
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, write, 0)


def pallas_eligible(h: int, w: int, c: int) -> bool:
    """True when the fused kernel will actually run for an (N,h,w,c) input:
    the scoped-VMEM working set (in/out blocks + row-chunk temporaries)
    must fit — see _plan_chunk. Callers with their own tuned XLA fallback
    (models/layers.GroupNorm) gate on this so an ineligible shape never
    detours through group_norm_ref."""
    return _plan_chunk(h * w, c) is not None


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               num_groups: int = 32, eps: float = 1e-5, silu: bool = False,
               use_pallas: bool | None = None,
               interpret: bool = False) -> jnp.ndarray:
    """GroupNorm over NHWC with optional fused SiLU."""
    n, h, w, c = x.shape
    assert c % num_groups == 0, (c, num_groups)
    if use_pallas is None:
        # Measured TWICE on v5e, both against this kernel (variance is a
        # VMEM two-pass; no E[x²]−E[x]² cancellation):
        #   * K-slope harness 2026-08-20, isolated: kernel 0.285 ms vs
        #     XLA 0.363 ms at (24,64,64,320) GN+SiLU (−21%), composite
        #     GN+SiLU+conv 1.597 vs 1.729 ms (−7.6%);
        #   * full UNet (bench.py, same day): 2,947.5 pairs/hr vs the
        #     XLA path's 3,032.6 (−2.8%) — the chain-level win is erased
        #     at program level because the pallas_call is a fusion
        #     boundary: XLA fuses the GN read pass into the producing
        #     residual/temb adds, and that fusion is worth more than the
        #     kernel's saved round-trip (the int8 composition lesson
        #     again, docs/perf_roofline.md).
        # XLA therefore stays the default; the kernel remains for callers
        # whose producers don't fuse (isolated normalization passes).
        use_pallas = False
    if use_pallas and _plan_chunk(h * w, c) is None:
        use_pallas = False  # working set exceeds scoped VMEM
    if not use_pallas:
        return group_norm_ref(x, scale, bias, num_groups, eps, silu)
    return _gn_pallas(x, scale, bias, num_groups, eps, silu, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_pallas(x, scale, bias, num_groups, eps, silu, interpret):
    """Pallas forward with a recompute backward: the UNet trains (AnySD
    experts, LCM distillation), so the kernel must be differentiable —
    the VJP re-derives gradients through the fp32 XLA reference on the
    saved inputs (backward is training-only; layout speed is secondary
    to exactness there)."""
    n, h, w, c = x.shape
    kernel = functools.partial(_gn_kernel, num_groups=num_groups, eps=eps,
                               silu=silu, chunk=_plan_chunk(h * w, c))
    xr = x.reshape(n, h * w, c)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h * w, c), x.dtype),
        interpret=interpret,
    )(xr, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(n, h, w, c)


def _gn_pallas_fwd(x, scale, bias, num_groups, eps, silu, interpret):
    return (_gn_pallas(x, scale, bias, num_groups, eps, silu, interpret),
            (x, scale, bias))


def _gn_pallas_bwd(num_groups, eps, silu, interpret, res, ct):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: group_norm_ref(x_, s_, b_, num_groups, eps, silu),
        x, scale, bias)
    return vjp(ct)


_gn_pallas.defvjp(_gn_pallas_fwd, _gn_pallas_bwd)


def group_norm_silu(x, scale, bias, num_groups: int = 32, eps: float = 1e-5,
                    **kw) -> jnp.ndarray:
    return group_norm(x, scale, bias, num_groups, eps, silu=True, **kw)
