"""composition — Omost-style canvas-planned generation
(reference composition_image_generation.py:1-256: Omost-llama-3-8b plans a
canvas; StableDiffusionXLOmostPipeline renders region-conditioned).

The canvas plan arrives either precomputed in `rec.extras['canvas_plan']`
(the L2 instruction generator emits it) or as the record's `edit` text in
the simple `global:` / `region: x1,y1,x2,y2 | desc` line format parsed by
`diffusion/regional.py::parse_canvas_plan`.
"""

from __future__ import annotations

import numpy as np

from anyedit_tpu.core.schema import InstructionRecord
from anyedit_tpu.edits.types import EditOutcome, Toolbox


def composition(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
                rng: np.random.Generator) -> EditOutcome:
    runner = tb.extra.get("composition")
    if runner is None:
        return EditOutcome(False, reason="composition stack unavailable")
    plan = rec.extras.get("canvas_plan") or rec.edit
    seed = int(rng.integers(0, 2 ** 31))
    generated = np.asarray(runner(plan, seed))
    return EditOutcome(True, edited=generated)
