"""On-device mask morphology: dilate / erode / blur / sobel.

The reference round-trips masks through JPEG files and cv2 inside the hot
loop (cv2.dilate tiered by union area, local_pipeline_tool.py:360-365;
sobel high-frequency maps, tool.py:366-386; dilate+blur paste-back,
filter_tool/utils.py:304-339). Here masks are arrays in HBM; morphology is
`lax.reduce_window`, blur is a separable depthwise conv — all fusable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pool(x: jnp.ndarray, k: int, op, init) -> jnp.ndarray:
    """2D window op over trailing (H, W) of a (..., H, W) array."""
    pad = k // 2
    dims = (1,) * (x.ndim - 2) + (k, k)
    strides = (1,) * x.ndim
    padding = ((0, 0),) * (x.ndim - 2) + (((pad, pad),) * 2)
    return jax.lax.reduce_window(x, init, op, dims, strides, padding)


def dilate(mask: jnp.ndarray, kernel_size: int = 3, iterations: int = 1) -> jnp.ndarray:
    """Binary/float dilation with a square structuring element (cv2.dilate parity)."""
    out = mask
    for _ in range(iterations):
        out = _pool(out, kernel_size, jax.lax.max, -jnp.inf if jnp.issubdtype(mask.dtype, jnp.floating) else jnp.iinfo(mask.dtype).min if jnp.issubdtype(mask.dtype, jnp.integer) else False)
    return out.astype(mask.dtype)


def erode(mask: jnp.ndarray, kernel_size: int = 3, iterations: int = 1) -> jnp.ndarray:
    out = mask
    for _ in range(iterations):
        out = _pool(out, kernel_size, jax.lax.min, jnp.inf if jnp.issubdtype(mask.dtype, jnp.floating) else jnp.iinfo(mask.dtype).max if jnp.issubdtype(mask.dtype, jnp.integer) else True)
    return out.astype(mask.dtype)


def tiered_dilate(mask: jnp.ndarray, union_area_ratio: jnp.ndarray) -> jnp.ndarray:
    """The reference's union-area-tiered dilation (local_pipeline_tool.py:360-365):
    bigger objects get bigger structuring elements before inpainting."""
    k_small = dilate(mask, 15)
    k_mid = dilate(mask, 25)
    k_big = dilate(mask, 35)
    return jnp.where(union_area_ratio < 0.05, k_small,
                     jnp.where(union_area_ratio < 0.15, k_mid, k_big))


def gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur over trailing (H, W) dims of (..., H, W)."""
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    k = gaussian_kernel1d(sigma, radius)
    orig_dtype = img.dtype
    x = img.astype(jnp.float32)
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    # reflect-pad before VALID conv — zero padding would fabricate gradients
    # at image borders (cv2.GaussianBlur parity)
    xf = x.reshape((-1, 1, h, w))
    xf = jnp.pad(xf, ((0, 0), (0, 0), (radius, radius), (radius, radius)),
                 mode="reflect")
    kv = k.reshape(1, 1, -1, 1)
    kh = k.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(xf.shape, kv.shape, ("NCHW", "OIHW", "NCHW"))
    xf = jax.lax.conv_general_dilated(xf, kv, (1, 1), "VALID", dimension_numbers=dn)
    xf = jax.lax.conv_general_dilated(xf, kh, (1, 1), "VALID", dimension_numbers=dn)
    return xf.reshape(lead + (h, w)).astype(orig_dtype)


def sobel_magnitude(gray: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient magnitude over trailing (H, W) — the reference's
    high-frequency map for AnyDoor collages (tool.py:366-386)."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T
    x = gray.astype(jnp.float32)
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    xf = x.reshape((-1, 1, h, w))
    dn = jax.lax.conv_dimension_numbers(xf.shape, (1, 1, 3, 3), ("NCHW", "OIHW", "NCHW"))
    gx = jax.lax.conv_general_dilated(xf, kx[None, None], (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
    gy = jax.lax.conv_general_dilated(xf, ky[None, None], (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
    mag = jnp.sqrt(gx * gx + gy * gy)
    return mag.reshape(lead + (h, w))
