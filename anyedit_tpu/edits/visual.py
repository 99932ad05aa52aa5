"""Visual-editing pipelines: condition channels, AnyDoor reference insert,
material transfer.

Ports:
  * visual_condition (visual_condition_tool.py:33-324) — derive the
    `visual_input` channel (canny sketch / depth / segmentation / scribble /
    bbox draw) from an existing edit pair and rewrite the instruction to
    "Follow/Refer to/Watch the given [v*] ...".
  * visual_reference (visual_reference_tool.py:63-232) — AnyDoor: insert a
    reference object into the grounded target region; collage hint =
    masked target + resized reference + sobel high-frequency map
    (tool.py:366-386); DINOv2 embedding of the reference conditions the
    ControlLDM.
  * material_transfer (material_transfer_tool.py:46-210) — grayscale-masked
    init + depth ControlNet + IP-Adapter material exemplar.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from anyedit_tpu.core.schema import InstructionRecord
from anyedit_tpu.edits.types import EditOutcome, Toolbox
from anyedit_tpu.ops.canny import canny, rgb_to_gray
from anyedit_tpu.ops.morphology import sobel_magnitude
from anyedit_tpu.ops.resize import resize_image

VC_PREFIX = {"visual_bbox": "[bbox]", "visual_depth": "[depth]",
             "visual_scribble": "[scribble]", "visual_segment": "[segment]",
             "visual_sketch": "[sketch]"}
VC_VERBS = ("Follow", "Refer to", "Watch")


def draw_bbox(image: np.ndarray, boxes: np.ndarray, valid: np.ndarray,
              thickness: int = 3) -> np.ndarray:
    """Rectangle outlines on a copy of the image (img2bbox, :154-164)."""
    out = image.copy()
    h, w = image.shape[:2]
    color = np.array([255, 0, 0], np.uint8)
    for box, ok in zip(boxes, valid):
        if not ok:
            continue
        x1, y1, x2, y2 = [int(np.clip(v, 0, lim))
                          for v, lim in zip(box, (w - 1, h - 1, w - 1, h - 1))]
        out[y1:y1 + thickness, x1:x2] = color
        out[max(0, y2 - thickness):y2, x1:x2] = color
        out[y1:y2, x1:x1 + thickness] = color
        out[y1:y2, max(0, x2 - thickness):x2] = color
    return out


def visual_condition(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
                     rng: np.random.Generator) -> EditOutcome:
    """Derive the visual_input channel for one of the visual_* types.

    SCHEMA NOTE: for these types `edited == image` BY DESIGN — the
    reference's data layout (visual_condition_tool.py:33-164) uses the
    original image as the *edited* target and ships the derived condition
    map as the extra `visual_input` channel (the trainee model learns to
    reproduce the image from the condition). Exporters must keep all three
    files; the pair is NOT a mislabeled identity edit."""
    vtype = rec.edit_type
    if vtype in ("visual_sketch",):
        vis = np.asarray(canny(rgb_to_gray(jnp.asarray(image))))
        vis = np.stack([vis] * 3, axis=-1)
    elif vtype == "visual_scribble":
        if tb.hed is None:
            return EditOutcome(False, reason="hed model unavailable")
        edges = np.asarray(tb.hed(image))
        vis = np.stack([(edges > 0.5).astype(np.uint8) * 255] * 3, axis=-1)
    elif vtype == "visual_depth":
        if tb.depth is None:
            return EditOutcome(False, reason="depth model unavailable")
        vis = np.asarray(tb.depth(image))
        vis = np.stack([vis] * 3, axis=-1)
    elif vtype == "visual_segment":
        if tb.seg is None:
            return EditOutcome(False, reason="segmentor unavailable")
        vis = np.asarray(tb.seg(image))
    elif vtype == "visual_bbox":
        g = tb.ground(image, rec.edited_object or rec.input, mode="merge")
        if g is None:
            return EditOutcome(False, reason="grounding failed")
        vis = draw_bbox(image, np.asarray(g.boxes), np.asarray(g.valid))
    else:
        return EditOutcome(False, reason=f"unknown visual type {vtype}")
    verb = rng.choice(VC_VERBS)
    rec.edit = f"{verb} the given {VC_PREFIX[vtype]} to edit: {rec.edit}"
    return EditOutcome(True, edited=image, visual_input=vis)


# ---- AnyDoor collage (visual_reference) ----------------------------------

def build_collage(target: np.ndarray, target_mask: np.ndarray,
                  ref_image: np.ndarray, ref_mask: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(collage RGB, HF-map) hint for AnyDoor's ControlNet (process_pairs,
    visual_reference_tool.py:63-142): paste the masked reference object into
    the target bbox; HF map = sobel magnitude of the pasted reference."""
    ys, xs = np.nonzero(target_mask)
    if len(ys) == 0:
        raise ValueError("empty target mask")
    y1, y2, x1, x2 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
    rys, rxs = np.nonzero(ref_mask)
    ry1, ry2, rx1, rx2 = rys.min(), rys.max() + 1, rxs.min(), rxs.max() + 1
    ref_crop = ref_image[ry1:ry2, rx1:rx2].astype(np.float32)
    ref_m = ref_mask[ry1:ry2, rx1:rx2].astype(np.float32)
    th, tw = y2 - y1, x2 - x1
    ref_crop = np.asarray(resize_image(jnp.asarray(ref_crop), th, tw, "bilinear"))
    ref_m = np.asarray(resize_image(jnp.asarray(ref_m[..., None]), th, tw,
                                    "bilinear"))[..., 0]
    collage = target.astype(np.float32).copy()
    region = collage[y1:y2, x1:x2]
    m3 = (ref_m > 0.5)[..., None]
    collage[y1:y2, x1:x2] = np.where(m3, ref_crop, region)
    hf = np.zeros(target.shape[:2], np.float32)
    sob = np.asarray(sobel_magnitude(jnp.asarray(rgb_to_gray(jnp.asarray(ref_crop)))))
    hf[y1:y2, x1:x2] = sob * (ref_m > 0.5)
    return np.clip(collage, 0, 255).astype(np.uint8), hf


def visual_reference(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
                     rng: np.random.Generator) -> EditOutcome:
    """AnyDoor insert. Needs tb.extra['anydoor'](target, collage, hf, ref)
    and a loaded reference image in tb.extra['load_visual'](rec)."""
    anydoor = tb.extra.get("anydoor")
    load_visual = tb.extra.get("load_visual")
    if anydoor is None or load_visual is None:
        return EditOutcome(False, reason="anydoor stack unavailable")
    g = tb.ground(image, rec.edited_object, mode="max")
    if g is None or not bool(np.any(np.asarray(g.mask))):
        return EditOutcome(False, reason="target object not found")
    tmask = np.asarray(g.mask)
    # completeness gate: bbox must not touch image edges (:268-281)
    ys, xs = np.nonzero(tmask)
    h, w = image.shape[:2]
    if ys.min() <= 1 or xs.min() <= 1 or ys.max() >= h - 2 or xs.max() >= w - 2:
        return EditOutcome(False, reason="target touches image edge")
    ref_image = load_visual(rec)
    gr = tb.ground(ref_image, rec.ref_object or rec.edited_object, mode="max")
    if gr is None or not bool(np.any(np.asarray(gr.mask))):
        return EditOutcome(False, reason="reference object not found")
    collage, hf = build_collage(image, tmask, ref_image, np.asarray(gr.mask))
    edited = np.asarray(anydoor(image, tmask, collage, hf, ref_image))
    return EditOutcome(True, edited=edited, mask=tmask,
                       visual_input=ref_image)


def material_transfer(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
                      rng: np.random.Generator) -> EditOutcome:
    """Grayscale-masked init + depth hint + IP-Adapter material exemplar
    (material_transfer_tool.py:46-210). Needs tb.extra['sdxl_material']
    (init_image, mask, depth_map, exemplar) → image and
    tb.extra['load_visual'] for the exemplar."""
    runner = tb.extra.get("sdxl_material")
    load_visual = tb.extra.get("load_visual")
    if runner is None or load_visual is None or tb.depth is None:
        return EditOutcome(False, reason="material stack unavailable")
    g = tb.ground(image, rec.edited_object, mode="max")
    if g is None or not bool(np.any(np.asarray(g.mask))):
        return EditOutcome(False, reason="object not found")
    mask = np.asarray(g.mask)
    gray = np.asarray(rgb_to_gray(jnp.asarray(image))).astype(np.uint8)
    init = image.copy()
    init[mask] = gray[mask, None]
    depth_map = np.asarray(tb.depth(image))
    exemplar = load_visual(rec)
    edited = np.asarray(runner(init, mask, depth_map, exemplar))
    return EditOutcome(True, edited=edited, mask=mask, visual_input=exemplar)
