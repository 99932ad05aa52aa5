"""Dataset-quality evaluation over edited pairs (`anyedit_tpu eval`).

The reference defines dataset quality OPERATIONALLY: a pair is good iff
it passes the post-filter predicate table (filter_tool/post_filter.py:
15-79) built from the CLIP / directional-CLIP / L1 scorers
(filter_tool/utils.py:24-40,102-110,284-301). This module turns those
same scorers into an offline evaluation harness: given a finished run
directory (ledger + saved images), it recomputes the metric suite per
pair and aggregates per edit type —

  * clip_out   — CLIP(edited image, output caption)   (utils.py:24-40)
  * clip_in    — CLIP(input image, input caption)
  * clip_im    — CLIPim: input↔edited image cosine (paper protocol's
                  consistency metric)
  * dir_clip   — directional CLIP                     (utils.py:284-301)
  * l1         — mean pixel L1 in [0,1]               (utils.py:102-110)
  * ssim       — structural similarity (AnyEdit implicit best-of-N score,
                  implicit_tool.py:34-127 uses CLIP+SSIM ranking)
  * dino_sim   — DINOv2 CLS cosine between input and edited (the paper
                  protocol's subject-fidelity metric; computed when the
                  toolbox carries the `dino_embed` slot)
  * pass_rate  — fraction of pairs that clear the post-filter thresholds
                  for their edit type (the dataset's acceptance bar)

This is the AnyEdit-Test-style quality readout for OUR outputs: the
reference distributes its held-out benchmark as data (README.md:35,40)
and keeps metric code in the paper; here the metrics ship as a CLI.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Callable, Optional

import numpy as np

from anyedit_tpu.core.schema import InstructionRecord
from anyedit_tpu.filters.post_filter import Scores, post_filter_decision

# Edit types whose post-filter predicate is FULLY computable from the
# (clip, dir_clip, l1) evidence this harness produces. The other gated
# types need detector existence checks (add/remove/counting/replace),
# VQA (background_change/color_alter) or OCR (textual_change) — their
# predicates would be vacuously False on None evidence, so `passes`
# stays None for them instead of poisoning the pass_rate.
EVAL_GATED = frozenset({"action_change", "appearance_alter",
                        "material_alter", "tone_transfer"})


@dataclasses.dataclass
class PairMetrics:
    key: str
    edit_type: str
    clip_out: Optional[float] = None
    clip_in: Optional[float] = None
    clip_im: Optional[float] = None         # CLIPim: input↔edited cosine
    dir_clip: Optional[float] = None
    l1: Optional[float] = None
    ssim: Optional[float] = None
    dino_sim: Optional[float] = None
    passes: Optional[bool] = None


def _resize_pair(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """L1/SSIM need same-shape pairs; resize b to a (bilinear, [0,1])."""
    import jax.numpy as jnp

    from anyedit_tpu.ops.resize import resize_image
    if a.shape == b.shape:
        return a, b
    h, w = a.shape[:2]
    b2 = np.asarray(resize_image(jnp.asarray(b, jnp.float32)[None],
                                 h, w, "bilinear")[0])
    return a, b2.astype(b.dtype)


def evaluate_pairs(tb, entries: list[dict],
                   loader: Callable[[InstructionRecord, dict],
                                    tuple[np.ndarray, np.ndarray]],
                   ) -> dict:
    """Score (input, edited) pairs. `entries` are success-ledger lines
    ({"key", "record", "payload"}); `loader(record, payload)` returns the
    (input_u8, edited_u8) images. Returns {"pairs": [...], "per_type":
    {...}, "overall": {...}}."""
    import jax.numpy as jnp

    from anyedit_tpu.filters.scorers import (
        directional_clip_score, l1_distance, ssim,
    )

    per: list[PairMetrics] = []
    for e in entries:
        rec = InstructionRecord.from_json(e["record"])
        src, dst = loader(rec, e.get("payload") or {})
        m = PairMetrics(key=e["key"], edit_type=rec.edit_type)

        if tb.clip_image is not None and tb.clip_text is not None:
            ie_s = np.asarray(tb.clip_image(src))
            ie_t = np.asarray(tb.clip_image(dst))
            te_s = np.asarray(tb.clip_text(rec.input))
            te_t = np.asarray(tb.clip_text(rec.output))
            m.clip_in = float((ie_s * te_s).sum())
            m.clip_out = float((ie_t * te_t).sum())
            m.clip_im = float((ie_s * ie_t).sum())
            m.dir_clip = float(np.asarray(directional_clip_score(
                jnp.asarray(ie_s), jnp.asarray(ie_t),
                jnp.asarray(te_s), jnp.asarray(te_t))).ravel()[0])

        dino = getattr(tb, "extra", {}).get("dino_embed") \
            if hasattr(tb, "extra") else None
        if dino is not None:
            e_s = dino(src)
            e_t = dino(dst)
            m.dino_sim = float((e_s * e_t).sum())

        a, b = _resize_pair(src, dst)
        a01 = a.astype(np.float32)[None] / 255.0      # scorers expect (N,...)
        b01 = b.astype(np.float32)[None] / 255.0
        m.l1 = float(np.asarray(l1_distance(jnp.asarray(a01),
                                            jnp.asarray(b01))).ravel()[0])
        m.ssim = float(np.asarray(ssim(jnp.asarray(a01),
                                       jnp.asarray(b01))).ravel()[0])
        sc = Scores(clip=m.clip_out, dir_clip=m.dir_clip, l1=m.l1)
        m.passes = bool(post_filter_decision(rec.edit_type, sc)) \
            if rec.edit_type in EVAL_GATED else None
        per.append(m)

    def agg(ms: list[PairMetrics]) -> dict:
        out: dict = {"count": len(ms)}
        for f in ("clip_out", "clip_in", "clip_im", "dir_clip", "l1",
                  "ssim", "dino_sim"):
            vals = [getattr(x, f) for x in ms if getattr(x, f) is not None]
            if vals:
                out[f] = {"mean": round(float(np.mean(vals)), 4),
                          "median": round(float(np.median(vals)), 4)}
        gated = [x.passes for x in ms if x.passes is not None]
        if gated:
            out["pass_rate"] = round(float(np.mean(gated)), 4)
        return out

    by_type: dict[str, list[PairMetrics]] = {}
    for m in per:
        by_type.setdefault(m.edit_type, []).append(m)
    return {
        "pairs": [dataclasses.asdict(m) for m in per],
        "per_type": {t: agg(ms) for t, ms in sorted(by_type.items())},
        "overall": agg(per),
    }


def run_dir_entries(run_dir: str | Path) -> list[dict]:
    """Success entries (with image payloads) from a run's ledger.jsonl."""
    out = []
    with open(Path(run_dir) / "ledger.jsonl") as f:
        for line in f:
            obj = json.loads(line)
            if obj.get("status") == "success":
                out.append(obj)
    return out


def _resolve(p: str, run_dir: Path, subdir: str) -> Path:
    """Payload image paths are stored as the executor wrote them —
    `out_root/<subdir>/<name>` with out_root VERBATIM from the run's
    --output (executor.py:377-387), i.e. absolute or relative to the
    run-time CWD. Resolve in that order, then fall back to the file's
    canonical place inside run_dir (covers evals launched from a
    different CWD than the run)."""
    cand = Path(p)
    if cand.is_absolute():
        return cand
    if cand.exists():
        return cand
    inside = run_dir / subdir / cand.name
    if inside.exists():
        return inside
    raise FileNotFoundError(
        f"cannot resolve {p!r}: tried CWD-relative and {inside}")


def default_loader(run_dir: str | Path, image_root: Optional[str | Path]):
    """Pair loader for a run directory: edited from payload.edited_file,
    input from payload.input_file when the pipeline synthesized one (add/
    outpainting), else the original image under image_root."""
    from PIL import Image
    run_dir = Path(run_dir)

    def load(rec: InstructionRecord, payload: dict):
        ep = payload.get("edited_file")
        if ep is None:
            raise FileNotFoundError(
                f"ledger entry for {rec.key()} has no edited_file — was the "
                "run executed with save_images=True?")
        dst = np.asarray(Image.open(
            _resolve(ep, run_dir, "edited_img")).convert("RGB"))
        ip = payload.get("input_file")
        if ip is not None:
            src = np.asarray(Image.open(
                _resolve(ip, run_dir, "input_img")).convert("RGB"))
        else:
            if image_root is None:
                raise FileNotFoundError(
                    f"{rec.key()}: no synthesized input image in the ledger "
                    "and no --image-root given")
            src = np.asarray(Image.open(
                Path(image_root) / rec.image_file).convert("RGB"))
        return src, dst

    return load
