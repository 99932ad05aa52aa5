"""Camera-move-style geometric edits: resize / movement / relation.

Ports of move_resize_pipeline_tool.py:333-437 and relation_tool.py:337-537:
pure host/array geometry — ground, occlusion-check, LaMa-erase, paste the
object's pixels back shifted or rescaled, synthesize the instruction text
from RNG word choices (kept deterministic via the record-keyed generator).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from anyedit_tpu.core.schema import InstructionRecord
from anyedit_tpu.edits.types import EditOutcome, Toolbox
from anyedit_tpu.ops.resize import resize_image

MOVE_WORDS = ("move", "shift", "relocate")
LEFT_WORDS = ("left", "to the left")
RIGHT_WORDS = ("right", "to the right")
BIGGER_WORDS = ("bigger", "larger", "zoom in the")
SMALLER_WORDS = ("smaller", "tinier", "zoom out the")


def _bbox_of_mask(mask: np.ndarray) -> tuple[int, int, int, int] | None:
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return None
    return int(xs.min()), int(ys.min()), int(xs.max()) + 1, int(ys.max()) + 1


def check_occlusion(obj_mask: np.ndarray, other_masks: np.ndarray | None,
                    thresh: float = 0.05) -> bool:
    """True = occluded (move/resize unsafe) — port of
    check_occlusion_by_segmentation (move_resize_pipeline_tool.py:54)."""
    if other_masks is None:
        return False
    overlap = (obj_mask[None] & other_masks).sum(axis=(1, 2))
    return bool(np.any(overlap / max(1, obj_mask.sum()) > thresh))


def paste_object(background: np.ndarray, obj_pixels: np.ndarray,
                 obj_mask: np.ndarray, dst_xy: tuple[int, int],
                 scale: float = 1.0) -> tuple[np.ndarray, np.ndarray]:
    """Paste (pixels, mask) centered at dst with scaling
    (`resize_cropimage2image`, move_resize_pipeline_tool.py:248)."""
    h, w = background.shape[:2]
    bb = _bbox_of_mask(obj_mask)
    assert bb is not None
    x1, y1, x2, y2 = bb
    crop = obj_pixels[y1:y2, x1:x2].astype(np.float32)
    cmask = obj_mask[y1:y2, x1:x2].astype(np.float32)
    if scale != 1.0:
        nh = max(1, int(round((y2 - y1) * scale)))
        nw = max(1, int(round((x2 - x1) * scale)))
        crop = np.asarray(resize_image(jnp.asarray(crop), nh, nw, "bilinear"))
        cmask = np.asarray(resize_image(jnp.asarray(cmask[..., None]), nh, nw,
                                        "bilinear"))[..., 0]
    ch, cw = cmask.shape
    cx, cy = dst_xy
    ox1 = int(round(cx - cw / 2))
    oy1 = int(round(cy - ch / 2))
    # clip paste region to canvas
    sx1, sy1 = max(0, -ox1), max(0, -oy1)
    dx1, dy1 = max(0, ox1), max(0, oy1)
    dx2, dy2 = min(w, ox1 + cw), min(h, oy1 + ch)
    if dx2 <= dx1 or dy2 <= dy1:
        return background, np.zeros(background.shape[:2], bool)
    out = background.astype(np.float32).copy()
    sub_m = (cmask[sy1:sy1 + dy2 - dy1, sx1:sx1 + dx2 - dx1] > 0.5)[..., None]
    out[dy1:dy2, dx1:dx2] = np.where(
        sub_m, crop[sy1:sy1 + dy2 - dy1, sx1:sx1 + dx2 - dx1],
        out[dy1:dy2, dx1:dx2])
    new_mask = np.zeros(background.shape[:2], bool)
    new_mask[dy1:dy2, dx1:dx2] = sub_m[..., 0]
    return np.clip(out, 0, 255).astype(np.uint8), new_mask


def resize_movement(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
                    rng: np.random.Generator) -> EditOutcome:
    """movement: paste shifted by Δx ∈ ±[50, 120]; resize: scale 0.7 / 1.3
    (move_resize_pipeline_tool.py:333-437)."""
    g = tb.ground(image, rec.edited_object, mode="max")
    if g is None or not bool(np.any(np.asarray(g.mask))):
        return EditOutcome(False, reason="object not found")
    mask = np.asarray(g.mask)
    other = np.asarray(g.masks) if g.masks is not None else None
    if other is not None and check_occlusion(mask, other[1:] if len(other) > 1 else None):
        return EditOutcome(False, reason="object occluded")
    bb = _bbox_of_mask(mask)
    x1, y1, x2, y2 = bb
    cx, cy = (x1 + x2) // 2, (y1 + y2) // 2
    img01 = image.astype(np.float32) / 255.0
    from anyedit_tpu.edits.local import _tiered_dilate_np
    mask_d = _tiered_dilate_np(mask, float(g.union_ratio))
    erased = np.clip(np.asarray(
        tb.inpaint(img01, mask_d.astype(np.float32))) * 255, 0, 255).astype(np.uint8)

    h, w = image.shape[:2]
    if rec.edit_type == "movement":
        delta = int(rng.integers(50, 121))
        direction = rng.choice(["left", "right"])
        dx = -delta if direction == "left" else delta
        new_cx = int(np.clip(cx + dx, (x2 - x1) // 2, w - (x2 - x1) // 2))
        edited, new_mask = paste_object(erased, image, mask, (new_cx, cy))
        word = rng.choice(MOVE_WORDS)
        dword = rng.choice(LEFT_WORDS if direction == "left" else RIGHT_WORDS)
        instruction = f"{word} the {rec.edited_object} {dword}"
    else:  # resize
        scale = float(rng.choice([0.7, 1.3]))
        edited, new_mask = paste_object(erased, image, mask, (cx, cy), scale)
        word = rng.choice(SMALLER_WORDS if scale < 1 else BIGGER_WORDS)
        if "zoom" in word:
            instruction = f"{word} {rec.edited_object}"
        else:
            instruction = f"make the {rec.edited_object} {word}"
    if not bool(new_mask.any()):
        return EditOutcome(False, reason="paste out of canvas")
    out = EditOutcome(True, edited=edited, mask=mask)
    out.scores["instruction"] = 0.0
    rec.edit = instruction  # synthesized text (reference :419-434)
    return out


def relation_change(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
                    rng: np.random.Generator) -> EditOutcome:
    """'swap' relation: erase both objects, cross-paste at each other's
    centers with scale adjustment (relation_tool.py:337-537,
    adjust_scale_if_necessary :325)."""
    obj_a = rec.edited_object
    obj_b = rec.new_object or rec.extras.get("second object")
    if not obj_a or not obj_b:
        return EditOutcome(False, reason="need two objects")
    ga = tb.ground(image, obj_a, mode="max")
    gb = tb.ground(image, obj_b, mode="max")
    for g, name in ((ga, obj_a), (gb, obj_b)):
        if g is None or not bool(np.any(np.asarray(g.mask))):
            return EditOutcome(False, reason=f"{name} not found")
    ma, mb = np.asarray(ga.mask), np.asarray(gb.mask)
    ba, bb_ = _bbox_of_mask(ma), _bbox_of_mask(mb)
    ca = ((ba[0] + ba[2]) // 2, (ba[1] + ba[3]) // 2)
    cb = ((bb_[0] + bb_[2]) // 2, (bb_[1] + bb_[3]) // 2)
    img01 = image.astype(np.float32) / 255.0
    from anyedit_tpu.edits.local import _tiered_dilate_np
    both = _tiered_dilate_np(ma | mb, float(max(ga.union_ratio, gb.union_ratio)))
    erased = np.clip(np.asarray(
        tb.inpaint(img01, both.astype(np.float32))) * 255, 0, 255).astype(np.uint8)
    # adjust scale so each object roughly fits the other's box
    sa = min(1.5, max(0.6, (bb_[2] - bb_[0]) / max(1, ba[2] - ba[0])))
    sb = min(1.5, max(0.6, (ba[2] - ba[0]) / max(1, bb_[2] - bb_[0])))
    step1, _ = paste_object(erased, image, ma, cb, sa)
    edited, _ = paste_object(step1, image, mb, ca, sb)
    rec.edit = f"swap the positions of the {obj_a} and the {obj_b}"
    return EditOutcome(True, edited=edited, mask=ma | mb)
