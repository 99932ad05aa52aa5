"""Local editing pipelines: add / remove / counting / replace / background.

Semantics ported from reference local_pipeline_tool.py:
  add (:234-297)                — target image given; ground the object and
                                  LaMa-remove it to SYNTHESIZE the input
                                  image; verify removal (re-detect,
                                  intersection < 0.5)
  remove/counting (:299-394)    — ground (merge/count mode) → tiered dilate
                                  → LaMa → verify gone (intersection < 0.2)
  replace (:396-458)            — mask → LaMa erase → SD-inpaint new object
                                  in bbox → verify new object detected
  background_change (:460-526)  — foreground mask merged+inverted →
                                  SD-inpaint background w/ negative prompt

The self-verification loops are part of the dataset's quality contract and
are kept faithful (thresholds cited inline).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from anyedit_tpu.core.schema import InstructionRecord
from anyedit_tpu.edits.types import EditOutcome, Toolbox
from anyedit_tpu.ops.morphology import dilate

BG_NEGATIVE_PROMPT = ("person, people, human, man, woman, child, animal, "
                      "low quality, blurry, distorted")


def _tiered_dilate_np(mask: np.ndarray, union_ratio: float) -> np.ndarray:
    """cv2.dilate tiers by union area (local_pipeline_tool.py:360-365)."""
    k = 15 if union_ratio < 0.05 else (25 if union_ratio < 0.15 else 35)
    return np.asarray(dilate(jnp.asarray(mask, jnp.float32), k) > 0.5)


def _mask_intersection_ratio(new_mask: np.ndarray, old_mask: np.ndarray) -> float:
    """|new ∩ old| / |new| — how much of the re-detected object overlaps the
    removed region."""
    denom = max(1, int(new_mask.sum()))
    return float((new_mask & old_mask).sum()) / denom


def remove(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
           rng: np.random.Generator) -> EditOutcome:
    mode = "count" if rec.edit_type == "counting" else "merge"
    count_k = rec.remove_number if rec.edit_type == "counting" else None
    g = tb.ground(image, rec.edited_object, mode=mode, count_k=count_k)
    if g is None or not bool(np.any(np.asarray(g.mask))):
        return EditOutcome(False, reason="object not found")
    mask = np.asarray(g.mask)
    mask_d = _tiered_dilate_np(mask, float(g.union_ratio))
    img01 = image.astype(np.float32) / 255.0
    inpainted = np.asarray(tb.inpaint(img01, mask_d.astype(np.float32)))
    edited = np.clip(inpainted * 255.0, 0, 255).astype(np.uint8)
    # verify: object gone or barely overlapping (intersection < 0.2, :371-393)
    g2 = tb.ground(edited, rec.edited_object, mode="merge")
    if g2 is not None and bool(np.any(np.asarray(g2.mask))):
        if _mask_intersection_ratio(np.asarray(g2.mask), mask_d) >= 0.2:
            return EditOutcome(False, edited=edited, mask=mask,
                               reason="object still detected after removal")
    return EditOutcome(True, edited=edited, mask=mask)


def add(tb: Toolbox, rec: InstructionRecord, target_image: np.ndarray,
        rng: np.random.Generator) -> EditOutcome:
    """`target_image` is the EDITED side; we synthesize the input by removal."""
    g = tb.ground(target_image, rec.edited_object, mode="merge")
    if g is None or not bool(np.any(np.asarray(g.mask))):
        return EditOutcome(False, reason="object not found in target")
    mask = np.asarray(g.mask)
    mask_d = _tiered_dilate_np(mask, float(g.union_ratio))
    img01 = target_image.astype(np.float32) / 255.0
    synth_input = np.clip(np.asarray(
        tb.inpaint(img01, mask_d.astype(np.float32))) * 255, 0, 255).astype(np.uint8)
    g2 = tb.ground(synth_input, rec.edited_object, mode="merge")
    if g2 is not None and bool(np.any(np.asarray(g2.mask))):
        if _mask_intersection_ratio(np.asarray(g2.mask), mask_d) >= 0.5:  # :291
            return EditOutcome(False, reason="removal for add failed")
    return EditOutcome(True, edited=target_image, input_image=synth_input,
                       mask=mask)


def replace(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
            rng: np.random.Generator) -> EditOutcome:
    g = tb.ground(image, rec.edited_object, mode="merge")
    if g is None or not bool(np.any(np.asarray(g.mask))):
        return EditOutcome(False, reason="object not found")
    mask = np.asarray(g.mask)
    bbox_mask = np.asarray(g.bbox_mask)
    mask_d = _tiered_dilate_np(mask, float(g.union_ratio))
    img01 = image.astype(np.float32) / 255.0
    erased = np.clip(np.asarray(
        tb.inpaint(img01, mask_d.astype(np.float32))) * 255, 0, 255).astype(np.uint8)
    prompt = f"a photo of {rec.new_object}"
    edited = np.asarray(tb.sd_inpaint(erased, bbox_mask.astype(np.float32),
                                      prompt, ""))
    g2 = tb.ground(edited, rec.new_object, mode="merge")
    if g2 is None or not bool(np.any(np.asarray(g2.mask))):
        return EditOutcome(False, edited=edited, mask=mask,
                           reason="new object not detected")
    return EditOutcome(True, edited=edited, mask=mask)


def background_change(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
                      rng: np.random.Generator) -> EditOutcome:
    """Foreground (+face) masks merged, inverted → SD-inpaint background."""
    fg_phrase = rec.edited_object or "foreground object"
    g = tb.ground(image, fg_phrase, mode="merge")
    if g is None or not bool(np.any(np.asarray(g.mask))):
        return EditOutcome(False, reason="foreground not found")
    fg = np.asarray(g.mask)
    gf = tb.ground(image, "face", mode="merge")
    if gf is not None:
        fg = fg | np.asarray(gf.mask)
    fg = np.asarray(dilate(jnp.asarray(fg, jnp.float32), 9) > 0.5)
    bg_mask = (~fg).astype(np.float32)
    prompt = rec.output or rec.edit
    edited = np.asarray(tb.sd_inpaint(image, bg_mask, prompt,
                                      BG_NEGATIVE_PROMPT))
    return EditOutcome(True, edited=edited, mask=~fg)
