"""Region-conditioned generation (AnyEdit-Composition / Omost).

Parity target: `composition_image_generation.py` (:40-62,104+) — an LLM
plans a canvas of (region, description) pairs and a region-conditioned
SDXL renders it. The reference relies on the external Omost pipeline; here
region conditioning is native: a cross-attention *bias* restricts each
image token to the text spans whose regions cover it — one more attention
processor, no model surgery.

The canvas-planning LLM is pluggable like every other LLM in this
framework; `parse_canvas_plan` accepts the simple line format
  region: x1,y1,x2,y2 | <description>
with one `global:` line, so any instruction-tuned model can drive it.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

from anyedit_tpu.models.layers import AttnMeta
from anyedit_tpu.ops.attention import sdpa_xla


@dataclasses.dataclass
class Region:
    box: tuple[float, float, float, float]   # normalized x1,y1,x2,y2
    span: tuple[int, int]                    # token span in the fused context


def parse_canvas_plan(text: str) -> tuple[str, list[tuple[tuple[float, ...], str]]]:
    """LLM canvas plan → (global prompt, [(normalized box, description)])."""
    global_prompt = ""
    regions = []
    for line in text.splitlines():
        line = line.strip()
        if line.lower().startswith("global:"):
            global_prompt = line.split(":", 1)[1].strip()
        m = re.match(r"region:\s*([\d.]+),([\d.]+),([\d.]+),([\d.]+)\s*\|\s*(.+)",
                     line, re.I)
        if m:
            box = tuple(float(m.group(i)) for i in range(1, 5))
            if max(box) > 1.0:   # pixel coords → caller normalizes later
                box = tuple(v / max(box) for v in box)
            regions.append((box, m.group(5).strip()))
    return global_prompt, regions


def region_bias(regions: Sequence[Region], hw: int, text_len: int,
                global_span: tuple[int, int]) -> jnp.ndarray:
    """(hw², text_len) additive bias: each image token may attend the global
    span plus the spans of regions covering it; other spans are masked."""
    allow = np.zeros((hw * hw, text_len), np.float32)
    gs, ge = global_span
    allow[:, gs:ge] = 1.0
    ys, xs = np.meshgrid(np.arange(hw), np.arange(hw), indexing="ij")
    cy = (ys.reshape(-1) + 0.5) / hw
    cx = (xs.reshape(-1) + 0.5) / hw
    for r in regions:
        x1, y1, x2, y2 = r.box
        inside = (cx >= x1) & (cx < x2) & (cy >= y1) & (cy < y2)
        s, e = r.span
        allow[inside, s:e] = 1.0
    return jnp.asarray(np.where(allow > 0, 0.0, -1e9))


def regional_processor(bias_by_len: dict[int, jnp.ndarray]) -> Callable:
    """Attention processor: applies the precomputed regional bias at every
    cross-attention site whose query length matches a prepared resolution."""

    def proc(q, k, v, meta: AttnMeta, extra):
        if meta.is_self or q.shape[2] not in bias_by_len:
            return sdpa_xla(q, k, v)
        bias = bias_by_len[q.shape[2]][None, None]     # (1,1,L_img,L_txt)
        return sdpa_xla(q, k, v, bias=bias)

    return proc


def build_regional_conditioning(encode_text: Callable[[str], jnp.ndarray],
                                global_prompt: str,
                                region_prompts: Sequence[tuple[tuple[float, ...], str]],
                                latent_hws: Sequence[int]
                                ) -> tuple[jnp.ndarray, Callable]:
    """Fused context = [global tokens ‖ region tokens…]; returns the context
    and the matching processor for the given latent resolutions."""
    parts = [encode_text(global_prompt)]
    spans = []
    offset = parts[0].shape[1]
    global_span = (0, offset)
    regions = []
    for box, prompt in region_prompts:
        emb = encode_text(prompt)
        parts.append(emb)
        spans.append((offset, offset + emb.shape[1]))
        offset += emb.shape[1]
        regions.append(Region(box=box, span=spans[-1]))
    ctx = jnp.concatenate(parts, axis=1)
    bias_by_len = {hw * hw: region_bias(regions, hw, ctx.shape[1], global_span)
                   for hw in latent_hws}
    return ctx, regional_processor(bias_by_len)
