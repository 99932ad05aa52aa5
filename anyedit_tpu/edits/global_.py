"""Global edits: color_alter / tone_transfer via the WYS-IP2P editor.

Port of `mask_crop_ip2p_pipeline` (global_pipeline_tool.py:124-203):
ground the object (color) or skip grounding (tone), run the masked IP2P
editor (100 steps, s_txt 8.0 / s_img 0.9 — global_tool.py:76,367), then
composite the edited crop back onto the original (color) or keep the full
edited frame (tone). `cropimage2image` becomes an on-device blend.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from anyedit_tpu.core.schema import InstructionRecord
from anyedit_tpu.edits.types import EditOutcome, Toolbox
from anyedit_tpu.ops.morphology import dilate, gaussian_blur


def crop_composite(original: np.ndarray, edited: np.ndarray,
                   mask: np.ndarray, feather_sigma: float = 2.0) -> np.ndarray:
    """Paste the edited region onto the original with a feathered seam
    (`cropimage2image`, global_pipeline_tool.py:195-201 / utils.py:304-339)."""
    m = jnp.asarray(mask, jnp.float32)
    m = dilate(m, 5)
    m = gaussian_blur(m, feather_sigma)[..., None]
    out = jnp.asarray(edited, jnp.float32) * m \
        + jnp.asarray(original, jnp.float32) * (1.0 - m)
    return np.clip(np.asarray(out), 0, 255).astype(np.uint8)


def color_alter(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
                rng: np.random.Generator) -> EditOutcome:
    g = tb.ground(image, rec.edited_object, mode="merge")
    if g is None or not bool(np.any(np.asarray(g.mask))):
        return EditOutcome(False, reason="object not found")
    mask = np.asarray(g.mask)
    edited_full = np.asarray(tb.ip2p(image, rec.edit, None,
                                     steps=100, s_txt=8.0, s_img=0.9))
    edited = crop_composite(image, edited_full, mask)
    return EditOutcome(True, edited=edited, mask=mask)


def tone_transfer(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
                  rng: np.random.Generator) -> EditOutcome:
    edited = np.asarray(tb.ip2p(image, rec.edit, None,
                                steps=100, s_txt=8.0, s_img=0.9))
    return EditOutcome(True, edited=edited)


def appearance_alter(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
                     rng: np.random.Generator) -> EditOutcome:
    """SD3-UltraEdit-style masked attribute edit (attribute_pipeline_tool.py:85-155):
    grounded mask (minus faces for humans) + masked instruction edit,
    50 steps, cfg 8.0 / image 1.5."""
    g = tb.ground(image, rec.edited_object, mode="merge")
    if g is None or not bool(np.any(np.asarray(g.mask))):
        return EditOutcome(False, reason="object not found")
    mask = np.asarray(g.mask)
    gf = tb.ground(image, "face", mode="merge")
    if gf is not None and bool(np.any(np.asarray(gf.mask))):
        mask = mask & ~np.asarray(gf.mask)   # face-exclusion (:104-130)
    mask01 = mask.astype(np.float32)
    ultraedit = tb.extra.get("ultraedit")
    if ultraedit is not None:
        # the reference routes attribute edits through SD3 UltraEdit
        # (attribute_pipeline_tool.py:85-155); IP2P is the fallback stack
        edited = np.asarray(ultraedit(image, rec.edit, mask01,
                                      steps=50, s_txt=8.0, s_img=1.5))
    else:
        edited = np.asarray(tb.ip2p(image, rec.edit, mask01,
                                    steps=50, s_txt=8.0, s_img=1.5))
    return EditOutcome(True, edited=edited, mask=mask)
