"""Grounded mask generation — the `maskgeneration` port (tool.py:166-269).

The single most load-bearing routine of the factory: detector logits+boxes
→ threshold → phrase match → NMS → SAM masks → per-mode combination
(max / merge / count). Everything array-shaped runs jitted at fixed box
count; only phrase bookkeeping is host-side.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from anyedit_tpu.ops.nms import nms_fixed

MAX_BOXES = 32  # static candidate budget after thresholding


@dataclasses.dataclass
class GroundingResult:
    """Masks in canvas pixels. All arrays fixed-shape; `count` marks valid rows."""

    boxes: jnp.ndarray        # (MAX_BOXES, 4) xyxy pixels
    scores: jnp.ndarray       # (MAX_BOXES,)
    valid: jnp.ndarray        # (MAX_BOXES,) bool
    masks: jnp.ndarray        # (MAX_BOXES, H, W) bool
    mask: jnp.ndarray         # (H, W) combined per mode
    bbox_mask: jnp.ndarray    # (H, W) filled boxes of selected instances
    union_ratio: jnp.ndarray  # scalar: union bbox area / image area

    @property
    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


def select_boxes(logits: jnp.ndarray, boxes_cxcywh: jnp.ndarray,
                 span: tuple[int, int], img_hw: tuple[int, int],
                 box_threshold: float = 0.25,
                 iou_threshold: float = 0.5,
                 max_boxes: int = MAX_BOXES):
    """Detector outputs → (boxes_xyxy_px, scores, valid) for one phrase span.

    logits: (Q, T) raw phrase logits; boxes: (Q, 4) normalized cxcywh.
    Score = max sigmoid logit inside the phrase's token span
    (get_grounding_output semantics, tool.py:116-147), then NMS
    (tool.py:191-225).
    """
    s, e = span
    h, w = img_hw
    probs = jax.nn.sigmoid(logits)
    if e > s:
        score = jnp.max(probs[:, s:e], axis=-1)
    else:
        score = jnp.max(probs, axis=-1)
    cx, cy, bw, bh = jnp.moveaxis(boxes_cxcywh, -1, 0)
    xyxy = jnp.stack([(cx - bw / 2) * w, (cy - bh / 2) * h,
                      (cx + bw / 2) * w, (cy + bh / 2) * h], axis=-1)
    # top-k prune to the static budget, then threshold + NMS
    k = min(max_boxes, score.shape[0])
    top_score, top_idx = jax.lax.top_k(score, k)
    top_boxes = xyxy[top_idx]
    keep = nms_fixed(top_boxes, top_score, iou_threshold=iou_threshold,
                     score_threshold=box_threshold)
    if k < max_boxes:
        pad = max_boxes - k
        top_boxes = jnp.pad(top_boxes, ((0, pad), (0, 0)))
        top_score = jnp.pad(top_score, (0, pad))
        keep = jnp.pad(keep, (0, pad))
    return top_boxes, top_score, keep


def combine_masks(masks: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
                  mode: str, count_k: int | None = None) -> jnp.ndarray:
    """(N,H,W) float mask logits>0 → combined (H,W) bool per reference mode:
    'max' = best-scoring instance, 'merge' = union of all,
    'count' = union of top-k instances (counting removal, tool.py:238-260)."""
    binm = (masks > 0) & valid[:, None, None]
    if mode == "max":
        best = jnp.argmax(jnp.where(valid, scores, -jnp.inf))
        return binm[best]
    if mode == "merge":
        return jnp.any(binm, axis=0)
    if mode == "count":
        k = count_k if count_k is not None else 1
        order = jnp.argsort(jnp.where(valid, -scores, jnp.inf))
        sel = jnp.zeros_like(valid).at[order[:k]].set(True)
        return jnp.any(binm & sel[:, None, None], axis=0)
    raise ValueError(mode)


def boxes_to_mask(boxes: jnp.ndarray, valid: jnp.ndarray,
                  img_hw: tuple[int, int]) -> jnp.ndarray:
    """Filled-rectangle mask of all valid boxes (the reference's bbox-mask)."""
    h, w = img_hw
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    x1, y1, x2, y2 = jnp.moveaxis(boxes, -1, 0)
    inside = ((xs[None] >= x1[:, None, None]) & (xs[None] <= x2[:, None, None])
              & (ys[None] >= y1[:, None, None]) & (ys[None] <= y2[:, None, None]))
    return jnp.any(inside & valid[:, None, None], axis=0)


def union_area_ratio(boxes: jnp.ndarray, valid: jnp.ndarray,
                     img_hw: tuple[int, int]) -> jnp.ndarray:
    """Area of the union bounding box of valid detections / image area
    (`union_generation`, tool.py:271-307 — the pre-filter's object-size gate)."""
    h, w = img_hw
    big = jnp.array([jnp.inf, jnp.inf, -jnp.inf, -jnp.inf])
    masked = jnp.where(valid[:, None],
                       boxes, jnp.broadcast_to(big, boxes.shape))
    x1 = jnp.min(masked[:, 0])
    y1 = jnp.min(masked[:, 1])
    x2 = jnp.max(masked[:, 2])
    y2 = jnp.max(masked[:, 3])
    any_valid = jnp.any(valid)
    area = jnp.clip(x2 - x1, 0, w) * jnp.clip(y2 - y1, 0, h)
    return jnp.where(any_valid, area / (h * w), 0.0)


def grounding_result(masks: jnp.ndarray, boxes: jnp.ndarray,
                     scores: jnp.ndarray, valid: jnp.ndarray,
                     img_hw: tuple[int, int], mode: str = "merge",
                     count_k: int | None = None) -> GroundingResult:
    return GroundingResult(
        boxes=boxes, scores=scores, valid=valid, masks=(masks > 0),
        mask=combine_masks(masks, scores, valid, mode, count_k),
        bbox_mask=boxes_to_mask(boxes, valid, img_hw),
        union_ratio=union_area_ratio(boxes, valid, img_hw),
    )
