"""The factory executor — one runtime replaces the reference's L5 layer
(20 shell scripts × CUDA_VISIBLE_DEVICES × --start-idx/--end-idx shards,
scripts/*.sh) and its per-script model reloading.

Flow per record: pre_filter → edit pipeline → post_filter → ledger, with
  * one resident Toolbox (each frozen model jitted once, shared),
  * shard/resume via `RunLedger` (idempotent restart),
  * per-stage wall-clock/throughput counters (`StageTimer`) — the
    observability the reference lacks entirely (SURVEY.md §5: tqdm-only),
  * optional `jax.profiler` trace capture around the hot stage.

Errors are contained per record (the reference's try/except-continue,
local_pipeline_tool.py:699-701) but recorded with reasons, not swallowed.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
import traceback
from collections import defaultdict
from pathlib import Path
from typing import Callable, Iterable, Optional, Sequence

import numpy as np

from anyedit_tpu.core.ledger import RunLedger, Shard
from anyedit_tpu.core.rng import host_rng
from anyedit_tpu.core.schema import InstructionRecord
from anyedit_tpu.edits.registry import get_pipeline
from anyedit_tpu.edits.types import EditOutcome, Toolbox
from anyedit_tpu.filters.post_filter import Scores, post_filter_decision
from anyedit_tpu.filters.pre_filter import PreScores, pre_filter_decision


class StageTimer:
    """Per-stage wall-clock accounting (replaces: nothing — the reference
    has no profiling, SURVEY.md §5)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict[str, dict[str, float]]:
        return {k: {"total_s": round(self.totals[k], 3),
                    "count": self.counts[k],
                    "mean_ms": round(1e3 * self.totals[k] / max(1, self.counts[k]), 2)}
                for k in sorted(self.totals)}


@dataclasses.dataclass
class ExecutorConfig:
    output_root: str = "out"
    seed: int = 0
    save_images: bool = True
    run_pre_filter: bool = True
    run_post_filter: bool = True
    profile_trace_dir: Optional[str] = None   # jax.profiler trace output


class FactoryExecutor:
    def __init__(self, toolbox: Toolbox, cfg: ExecutorConfig | None = None,
                 pre_scorer: Optional[Callable] = None,
                 post_scorer: Optional[Callable] = None):
        """pre_scorer(record, image) → PreScores;
        post_scorer(record, image, outcome) → Scores.
        Defaults produce permissive scores when scorer models are absent."""
        self.tb = toolbox
        self.cfg = cfg or ExecutorConfig()
        self.timer = StageTimer()
        self.pre_scorer = pre_scorer or self._default_pre_scorer
        self.post_scorer = post_scorer or self._default_post_scorer

    # ---- default scorers (permissive without scorer models) -------------
    def _default_pre_scorer(self, rec, image) -> PreScores:
        h, w = image.shape[:2]
        s = PreScores(width=w, height=h)
        if self.tb.clip_image is not None and self.tb.clip_text is not None:
            ie = np.asarray(self.tb.clip_image(image))
            te = np.asarray(self.tb.clip_text(rec.input))
            s.clip = float((ie * te).sum(-1).squeeze())
        return s

    def _default_post_scorer(self, rec, image, outcome: EditOutcome) -> Scores:
        s = Scores()
        if self.tb.clip_image is not None and self.tb.clip_text is not None \
                and outcome.edited is not None:
            ie = np.asarray(self.tb.clip_image(outcome.edited))
            te = np.asarray(self.tb.clip_text(rec.output))
            s.clip = float((ie * te).sum(-1).squeeze())
        # detector-based (non-)existence check in the edited image
        # (reference filter_tool/utils.py:212-276 object_detection)
        if self.tb.ground is not None and outcome.edited is not None:
            phrase = rec.new_object if rec.edit_type == "replace" else rec.edited_object
            if phrase and rec.edit_type in ("add", "remove", "counting", "replace"):
                g = self.tb.ground(outcome.edited, phrase, mode="merge")
                present = g is not None and bool(np.any(np.asarray(g.mask)))
                if present and outcome.mask is not None \
                        and rec.edit_type in ("remove", "counting"):
                    # must overlap the edited region to count (≥0.2 mask-IoU rule)
                    inter = (np.asarray(g.mask) & outcome.mask).sum()
                    present = inter / max(1, np.asarray(g.mask).sum()) >= 0.2
                s.object_present = present
        return s

    # ---- main loop ------------------------------------------------------
    def run(self, records: Sequence[InstructionRecord],
            load_image: Callable[[InstructionRecord], np.ndarray],
            shard: Shard | None = None,
            ledger_path: str | Path | None = None) -> dict:
        cfg = self.cfg
        out_root = Path(cfg.output_root)
        ledger = RunLedger(ledger_path or out_root / "ledger.jsonl")
        (out_root / "edited_img").mkdir(parents=True, exist_ok=True)
        (out_root / "input_img").mkdir(parents=True, exist_ok=True)
        (out_root / "mask").mkdir(parents=True, exist_ok=True)

        trace_ctx = contextlib.nullcontext()
        if cfg.profile_trace_dir:
            import jax
            trace_ctx = jax.profiler.trace(cfg.profile_trace_dir)

        with trace_ctx:
            for idx, rec in ledger.pending(records, shard):
                try:
                    self._run_one(rec, load_image, ledger, out_root)
                except Exception as e:  # contain per record, keep the reason
                    ledger.mark(rec, "failure",
                                {"error": f"{type(e).__name__}: {e}",
                                 "trace": traceback.format_exc(limit=3)})
        report = {"counts": ledger.counts(), "stages": self.timer.report()}
        ledger.close()
        return report

    def _run_one(self, rec: InstructionRecord, load_image, ledger: RunLedger,
                 out_root: Path) -> None:
        rng = host_rng(self.cfg.seed, rec.key())
        with self.timer.stage("load"):
            image = load_image(rec)

        if self.cfg.run_pre_filter:
            with self.timer.stage("pre_filter"):
                ps = self.pre_scorer(rec, image)
                ok = pre_filter_decision(rec.edit_type, ps,
                                         edited_object=rec.edited_object or "",
                                         rng_uniform=float(rng.uniform()))
            if not ok:
                ledger.mark(rec, "filtered", {"stage": "pre"})
                return

        with self.timer.stage(f"edit/{rec.edit_type}"):
            pipeline = get_pipeline(rec.edit_type)
            outcome = pipeline(self.tb, rec, image, rng)

        if not outcome.success:
            ledger.mark(rec, "failure", {"reason": outcome.reason})
            return

        if self.cfg.run_post_filter:
            with self.timer.stage("post_filter"):
                sc = self.post_scorer(rec, image, outcome)
                ok = post_filter_decision(rec.edit_type, sc)
            if not ok:
                ledger.mark(rec, "filtered",
                            {"stage": "post", "scores": dataclasses.asdict(sc)})
                return

        payload = {}
        if self.cfg.save_images and outcome.edited is not None:
            stem = Path(rec.image_file or rec.key().replace("/", "_")).stem
            from PIL import Image
            ep = out_root / "edited_img" / f"{stem}.png"
            Image.fromarray(outcome.edited).save(ep)
            rec.edited_file = ep.name
            payload["edited_file"] = str(ep)
            if outcome.input_image is not None:
                ip = out_root / "input_img" / f"{stem}.png"
                Image.fromarray(outcome.input_image).save(ip)
                payload["input_file"] = str(ip)
            if outcome.mask is not None:
                mp = out_root / "mask" / f"{stem}.png"
                Image.fromarray((outcome.mask.astype(np.uint8)) * 255).save(mp)
                payload["mask_file"] = str(mp)
        ledger.mark(rec, "success", payload)
