"""Canny edge detection, on-device (replaces cv2.Canny in
visual_condition_tool.py:33 img2canny / implicit_tool.py canny pass).

Gaussian blur → Sobel → gradient-direction NMS (4-bin) → double threshold
with one-pass hysteresis dilation (weak pixels adjacent to strong survive —
iterated a fixed small number of times for jit-ability).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from anyedit_tpu.ops.morphology import gaussian_blur, dilate


def canny(gray: jnp.ndarray, low: float = 100.0, high: float = 200.0,
          sigma: float = 1.0, hysteresis_iters: int = 4) -> jnp.ndarray:
    """gray (H, W) in [0,255] → edges (H, W) uint8 {0, 255}."""
    g = gaussian_blur(gray.astype(jnp.float32), sigma)
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T
    # reflect-pad so image borders don't read as step edges (cv2 parity)
    x4 = jnp.pad(g[None, None], ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
    dn = jax.lax.conv_dimension_numbers(x4.shape, (1, 1, 3, 3),
                                        ("NCHW", "OIHW", "NCHW"))
    gx = jax.lax.conv_general_dilated(x4, kx[None, None], (1, 1),
                                      "VALID", dimension_numbers=dn)[0, 0]
    gy = jax.lax.conv_general_dilated(x4, ky[None, None], (1, 1),
                                      "VALID", dimension_numbers=dn)[0, 0]
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]

    # 4-bin direction NMS: compare against the two neighbors along gradient
    deg = (jnp.degrees(ang) + 180.0) % 180.0
    def shift(a, dy, dx):
        return jnp.roll(jnp.roll(a, dy, axis=0), dx, axis=1)
    n0 = jnp.maximum(shift(mag, 0, 1), shift(mag, 0, -1))      # 0°: E/W
    n45 = jnp.maximum(shift(mag, -1, 1), shift(mag, 1, -1))    # 45°
    n90 = jnp.maximum(shift(mag, 1, 0), shift(mag, -1, 0))     # 90°: N/S
    n135 = jnp.maximum(shift(mag, -1, -1), shift(mag, 1, 1))   # 135°
    neighbor = jnp.where(
        (deg < 22.5) | (deg >= 157.5), n0,
        jnp.where(deg < 67.5, n45, jnp.where(deg < 112.5, n90, n135)))
    nms = jnp.where(mag >= neighbor, mag, 0.0)

    strong = nms >= high
    weak = (nms >= low) & ~strong

    def hyst(_, s):
        grown = dilate(s.astype(jnp.float32), 3) > 0.5
        return s | (grown & weak)

    edges = jax.lax.fori_loop(0, hysteresis_iters, hyst, strong)
    return edges.astype(jnp.uint8) * 255


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray([0.299, 0.587, 0.114], rgb.dtype if
                    jnp.issubdtype(rgb.dtype, jnp.floating) else jnp.float32)
    return jnp.tensordot(rgb.astype(w.dtype), w, axes=([-1], [0]))
