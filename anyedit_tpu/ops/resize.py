"""On-device image resizing to the canonical shape buckets.

Replaces the reference's host-side PIL LANCZOS / cv2 resizes scattered
through the hot loops (tool.py:93, local_pipeline_tool.py:32) with
`jax.image.resize` (lanczos3 ≈ PIL LANCZOS) so pixels stay in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_METHODS = {"lanczos": "lanczos3", "bilinear": "bilinear", "bicubic": "cubic",
            "nearest": "nearest"}


def resize_image(img: jnp.ndarray, height: int, width: int,
                 method: str = "lanczos", antialias: bool = True) -> jnp.ndarray:
    """Resize (..., H, W, C) images on device."""
    shape = img.shape[:-3] + (height, width, img.shape[-1])
    return jax.image.resize(img, shape, method=_METHODS.get(method, method),
                            antialias=antialias)


def resize_to_canvas(img: jnp.ndarray, size: int, method: str = "lanczos") -> jnp.ndarray:
    """Square editing canvas (the reference's 512×512 ingest resize)."""
    return resize_image(img, size, size, method=method)


def normalize_to_unit(img_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] → float32 [-1,1] (diffusion convention)."""
    return img_u8.astype(jnp.float32) / 127.5 - 1.0


def denormalize_to_u8(img: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5, 0, 255)
    return jnp.round(x).astype(jnp.uint8)


def imagenet_normalize(img01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float → ImageNet-normalized (detector/encoder convention)."""
    mean = jnp.asarray([0.485, 0.456, 0.406], img01.dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], img01.dtype)
    return (img01 - mean) / std
