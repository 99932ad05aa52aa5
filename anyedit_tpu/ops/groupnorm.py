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


_GN_ROW_CHUNK = 512


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int,
               eps: float, silu: bool):
    """One image per grid step; x stays bf16 in VMEM, stats accumulate in
    fp32 over row chunks (fp32 temporaries never exceed one chunk).

    Mosaic can't shape-cast (HW,C)->(HW,G,C/G) for unaligned C/G, so the
    channel→group reduction is a one-hot matmul instead (tiny MXU op).
    """
    hw, c = x_ref.shape[1], x_ref.shape[2]
    cg = c // num_groups
    chunk = min(_GN_ROW_CHUNK, hw)
    n_chunks = hw // chunk
    assert hw % chunk == 0, (hw, chunk)

    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    member = (ch // cg == grp).astype(jnp.float32)      # (C, G)

    def accum(i, carry):
        s1, s2 = carry
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return s1 + jnp.sum(xc, 0, keepdims=True), s2 + jnp.sum(xc * xc, 0, keepdims=True)

    z = jnp.zeros((1, c), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, n_chunks, accum, (z, z))
    denom = float(hw * cg)
    mean_g = jnp.dot(s1, member, preferred_element_type=jnp.float32) / denom  # (1, G)
    var_g = jnp.dot(s2, member, preferred_element_type=jnp.float32) / denom \
        - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, member.T, preferred_element_type=jnp.float32)    # (1, C)
    inv_c = jnp.dot(inv_g, member.T, preferred_element_type=jnp.float32)
    a = inv_c * scale_ref[:].astype(jnp.float32)                               # (1, C)
    b = bias_ref[:].astype(jnp.float32) - mean_c * a

    def write(i, _):
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xc * a + b
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, write, 0)


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               num_groups: int = 32, eps: float = 1e-5, silu: bool = False,
               use_pallas: bool | None = None,
               interpret: bool = False) -> jnp.ndarray:
    """GroupNorm over NHWC with optional fused SiLU."""
    n, h, w, c = x.shape
    assert c % num_groups == 0, (c, num_groups)
    if use_pallas is None:
        # Measured on v5e (2026-08): XLA's fused GN+SiLU matches or beats this
        # kernel at SD shapes (see tests/bench notes), so the XLA path is the
        # default; the kernel stays for shapes where fusion breaks down.
        use_pallas = False
    if use_pallas and not (h * w * c * 2 <= 6 * 2 ** 20):
        use_pallas = False  # one image block must fit VMEM
    if h * w % min(_GN_ROW_CHUNK, h * w) != 0:
        use_pallas = False  # row-chunked kernel needs an even split
    if not use_pallas:
        return group_norm_ref(x, scale, bias, num_groups, eps, silu)
    kernel = functools.partial(_gn_kernel, num_groups=num_groups, eps=eps, silu=silu)
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


def group_norm_silu(x, scale, bias, num_groups: int = 32, eps: float = 1e-5,
                    **kw) -> jnp.ndarray:
    return group_norm(x, scale, bias, num_groups, eps, silu=True, **kw)
