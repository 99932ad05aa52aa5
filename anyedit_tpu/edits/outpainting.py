"""Outpainting pair synthesis (reference outpainting.py:31-67 +
`img4outpainting` tool.py:309-353).

No diffusion: pick a grounded object whose bbox covers 10–50% of the image
and does not hug the borders, crop an expanded window around it as the
*input* image; the original full frame is the *edited* target; instruction
is a template draw.
"""

from __future__ import annotations

import numpy as np

from anyedit_tpu.core.schema import InstructionRecord
from anyedit_tpu.edits.types import EditOutcome, Toolbox

OUTPAINT_TEMPLATES = (
    "Outpaint the image as you can",
    "Imagine the whole scene from this part",
    "Complete the image as you can",
)


def select_crop(boxes: np.ndarray, valid: np.ndarray, img_hw: tuple[int, int],
                area_lo: float = 0.10, area_hi: float = 0.50,
                margin: int = 5) -> tuple[int, int, int, int] | None:
    """First box with area ratio in [lo, hi] not touching the borders."""
    h, w = img_hw
    for box, ok in zip(boxes, valid):
        if not ok:
            continue
        x1, y1, x2, y2 = [int(round(float(v))) for v in box]
        area = max(0, x2 - x1) * max(0, y2 - y1) / (h * w)
        if not (area_lo <= area <= area_hi):
            continue
        if x1 < margin or y1 < margin or x2 > w - margin or y2 > h - margin:
            continue
        return x1, y1, x2, y2
    return None


def outpainting(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
                rng: np.random.Generator) -> EditOutcome:
    phrase = rec.edited_object or rec.input
    g = tb.ground(image, phrase, mode="merge")
    if g is None:
        return EditOutcome(False, reason="grounding failed")
    box = select_crop(np.asarray(g.boxes), np.asarray(g.valid), image.shape[:2])
    if box is None:
        return EditOutcome(False, reason="no suitable crop box")
    x1, y1, x2, y2 = box
    # expand the crop window by 10% each side (keeps some context)
    h, w = image.shape[:2]
    ex = int(0.1 * (x2 - x1))
    ey = int(0.1 * (y2 - y1))
    x1, y1 = max(0, x1 - ex), max(0, y1 - ey)
    x2, y2 = min(w, x2 + ex), min(h, y2 + ey)
    crop = image[y1:y2, x1:x2]
    rec.edit = str(rng.choice(OUTPAINT_TEMPLATES))
    return EditOutcome(True, edited=image, input_image=crop)
