"""Fixed-size non-maximum suppression, jit-compatible.

Replaces `torchvision.ops.nms` at reference tool.py:224 (box NMS in the
grounding stage). TPU-friendly formulation: static box count, iterative
greedy selection under `lax.fori_loop`, returns a keep mask instead of a
dynamic index list.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix for xyxy boxes: a (N,4) × b (M,4) → (N,M)."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray,
              iou_threshold: float = 0.5,
              score_threshold: float = -jnp.inf) -> jnp.ndarray:
    """Greedy NMS over a fixed N. Returns bool keep-mask of shape (N,).

    Equivalent to torchvision.ops.nms on the valid set; invalid boxes
    (score below threshold) are never selected.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    valid = scores > score_threshold

    def body(_, carry):
        keep, alive = carry
        masked = jnp.where(alive, scores, -jnp.inf)
        idx = jnp.argmax(masked)
        any_alive = jnp.any(alive)
        keep = keep.at[idx].set(jnp.where(any_alive, True, keep[idx]))
        # kill everything overlapping the selected box (including itself)
        suppress = iou[idx] > iou_threshold
        suppress = suppress | (jnp.arange(n) == idx)
        alive = alive & jnp.where(any_alive, ~suppress, True)
        return keep, alive

    keep0 = jnp.zeros((n,), bool)
    keep, _ = jax.lax.fori_loop(0, n, body, (keep0, valid))
    return keep
