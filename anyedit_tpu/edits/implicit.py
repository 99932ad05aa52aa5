"""implicit_change — the EditWorld chain (reference implicit_tool.py:76-235).

Stages (each a Toolbox slot so the executor shares the resident models):
  1. P2P generation of the (ori, tar) caption pair with an AttentionStore;
     `mask_from_CA` on the keyword localizes where the change happens,
  2. SDXL-inpaint regenerates ori/tar inside the keyword mask,
  3. img2img refine pass on the target,
  4. canny + IP-Adapter(controlnet-canny) consistency pass,
  5. best-of-N candidate selection by CLIP(target caption) + SSIM(vs ori).

Also hosts `style_change` (scripts/scripts.md:111-112 — external prisma in
the reference): styled via the global IP2P editor here.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from anyedit_tpu.core.schema import InstructionRecord
from anyedit_tpu.edits.types import EditOutcome, Toolbox
from anyedit_tpu.filters.scorers import ssim


def implicit_change(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
                    rng: np.random.Generator, n_candidates: int = 3
                    ) -> EditOutcome:
    """Needs toolbox extras:
      p2p_pair(ori_caption, tar_caption, keyword, seed)
          → (ori_img, tar_img, keyword_mask)
      sdxl_inpaint(image, mask01, prompt, seed) → image  (stage 2)
      sdxl_img2img(image, prompt, strength, seed) → image
      canny_consistency(image, prompt, seed, ref_image=, mask01=) → image
          (IP-Adapter+CN pass)
    """
    p2p_pair = tb.extra.get("p2p_pair")
    inpaint = tb.extra.get("sdxl_inpaint")
    img2img = tb.extra.get("sdxl_img2img")
    consistency = tb.extra.get("canny_consistency")
    if p2p_pair is None:
        return EditOutcome(False, reason="p2p stack unavailable")
    keyword = rec.edited_object or (rec.output.split() or ["scene"])[0]

    best = None
    best_score = -np.inf
    for cand in range(n_candidates):
        seed = int(rng.integers(0, 2 ** 31)) + cand
        ori, tar, mask = p2p_pair(rec.input, rec.output, keyword, seed)
        if inpaint is not None and mask is not None:
            # Stage 2 (implicit_tool.py:96-127): regenerate BOTH sides from
            # the stage-1 ori image inside the keyword mask — prompt=ori
            # caption gives the clean source, prompt=tar caption the change.
            ori_s1 = ori
            ori = np.asarray(inpaint(ori_s1, mask, rec.input, seed))
            tar = np.asarray(inpaint(ori_s1, mask, rec.output, seed + 1))
        if img2img is not None:
            tar = np.asarray(img2img(tar, rec.output, 0.5, seed))
        if consistency is not None:
            tar = np.asarray(consistency(tar, rec.output, seed,
                                         ref_image=ori, mask01=mask))
        score = 0.0
        if tb.clip_image is not None and tb.clip_text is not None:
            ie = np.asarray(tb.clip_image(tar))
            te = np.asarray(tb.clip_text(rec.output))
            score += float((ie * te).sum(-1).squeeze())
        score += 0.5 * float(ssim(jnp.asarray(ori, jnp.float32) / 255.0,
                                  jnp.asarray(tar, jnp.float32) / 255.0))
        if score > best_score:
            best_score = score
            best = (ori, tar, mask)
    if best is None:
        return EditOutcome(False, reason="no candidate generated")
    ori, tar, mask = best
    return EditOutcome(True, edited=np.asarray(tar),
                       input_image=np.asarray(ori),
                       mask=None if mask is None else np.asarray(mask),
                       scores={"best": float(best_score)})


def style_change(tb: Toolbox, rec: InstructionRecord, image: np.ndarray,
                 rng: np.random.Generator) -> EditOutcome:
    """Global style transfer via the instruction editor (the reference
    defers this type to an external app; here it is first-class)."""
    edited = np.asarray(tb.ip2p(image, rec.edit, None,
                                steps=50, s_txt=7.5, s_img=1.2))
    return EditOutcome(True, edited=edited)
