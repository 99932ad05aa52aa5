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
import sys
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
    # >0: device-batch the first grounding call of N records into ONE
    # detector forward + ONE SAM encode (the per-record loop is the
    # factory's throughput ceiling, SURVEY §3.1)
    grounding_batch: int = 0
    # chunk mode only: device-batch the unmasked full-frame IP2P edits of
    # pre-filter survivors into one batch-N denoise program (replaces the
    # reference's per-record edit loop, local_pipeline_tool.py:584-710 —
    # the ~2.7× edit-stage gap of VERDICT r4 weak #2)
    batch_edits: bool = True
    # chunk mode only: device-batch the first groundings. False keeps
    # chunk mode (CLIP batching + batched edits + double-buffered IO) but
    # grounds per record through the memo — the right setting on 16 GiB
    # chips at PRODUCTION grounding shapes, where even a batch-4 GDINO
    # SwinB@800px program exhausts HBM next to the resident model set
    # (measured 2026-08-20); the edit-batch win survives intact.
    batch_grounding: bool = True
    # bench hook: force the batched edits' DDIM step count (the pipelines
    # hardcode the reference's production counts, edits/global_.py)
    ip2p_steps_override: Optional[int] = None


# each edit type's FIRST tb.ground call: (phrase field, mode, count field).
# Only these are batchable ahead of the pipeline; verify-loop re-detections
# on edited images always run live.
_FIRST_GROUND: dict[str, tuple[str, str]] = {
    "remove": ("edited_object", "merge"), "counting": ("edited_object", "count"),
    "add": ("edited_object", "merge"), "replace": ("edited_object", "merge"),
    "background_change": ("edited_object", "merge"),
    "color_alter": ("edited_object", "merge"),
    "appearance_alter": ("edited_object", "merge"),
    "material_alter": ("edited_object", "merge"),
    "resize": ("edited_object", "max"), "movement": ("edited_object", "max"),
    "relation": ("edited_object", "max"),
    "outpainting": ("edited_object", "merge"),
    "visual_bbox": ("edited_object", "merge"),
    "visual_reference": ("edited_object", "max"),
    "visual_material_transfer": ("edited_object", "max"),
    "material_transfer": ("edited_object", "max"),
}


# edit types whose pipeline makes exactly ONE unmasked full-frame ip2p
# call with these (steps, s_txt, s_img) — the reference's production
# settings (color/tone: global_tool.py:76,367 100-step 8.0/0.9; style:
# edits/implicit.py). Masked calls (appearance fallback) stay per-record:
# their mask depends on pipeline-internal state.
_NO_CACHE = object()   # "grounding not precomputed" sentinel

_IP2P_EDIT: dict[str, tuple[int, float, float]] = {
    "color_alter": (100, 8.0, 0.9),
    "tone_transfer": (100, 8.0, 0.9),
    "style_change": (50, 7.5, 1.2),
}


def _first_ground_spec(rec) -> Optional[tuple[str, str, Optional[int]]]:
    spec = _FIRST_GROUND.get(rec.edit_type)
    if spec is None:
        return None
    phrase = getattr(rec, spec[0]) or (rec.input if rec.edit_type in
                                       ("outpainting", "visual_bbox") else None)
    if rec.edit_type == "background_change" and not phrase:
        phrase = "foreground object"
    if not phrase:
        return None
    count_k = rec.remove_number if spec[1] == "count" else None
    return phrase, spec[1], count_k


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
        self._gcache: dict = {}
        self._ccache: dict = {}    # id(image) → batched CLIP image embed
        self._ecache: dict = {}    # precomputed chunk-batched ip2p edits
        self._gmemo: dict = {}     # record-scoped grounding memo
        if self.tb.ground is not None:
            self._wrap_ground()
        if getattr(self.tb, "ip2p", None) is not None \
                and hasattr(self.tb.ip2p, "_real"):
            # shed a previous executor's layer (shared toolbox): its
            # config/caches must not leak into this run
            self.tb.ip2p = self.tb.ip2p._real
        if getattr(self.tb, "ip2p", None) is not None and (
                (self.cfg.grounding_batch and self.cfg.batch_edits
                 and getattr(self.tb.ip2p, "batch", None) is not None)
                # the steps override must bite in per-record mode too —
                # a config knob that silently no-ops is a footgun
                or self.cfg.ip2p_steps_override):
            self._wrap_ip2p()

    def _wrap_ip2p(self) -> None:
        """Serve precomputed chunk-batched edits by (image identity,
        instruction, steps, scales, seed); masked or uncached calls fall
        through to the live per-record editor."""
        real = getattr(self.tb.ip2p, "_real", self.tb.ip2p)

        def ip2p(image, instruction, mask01, steps=50, s_txt=8.0,
                 s_img=0.9, **kw):
            if self.cfg.ip2p_steps_override:
                # the same override the batch precompute applied — pipeline
                # callers hardcode production step counts (edits/global_.py)
                steps = self.cfg.ip2p_steps_override
            if mask01 is None:
                hit = self._ecache.get((id(image), instruction, steps,
                                        s_txt, s_img, kw.get("seed", 0)))
                if hit is not None:
                    return hit
            return real(image, instruction, mask01, steps=steps,
                        s_txt=s_txt, s_img=s_img, **kw)

        ip2p._real = real
        ip2p.batch = getattr(real, "batch", None)
        self.tb.ip2p = ip2p

    def _wrap_ground(self) -> None:
        """Two grounding caches in front of the live grounder:
          * chunk cache (_gcache) — precomputed batched first groundings,
          * record memo (_gmemo) — within ONE record pass, repeated
            (image, phrase, mode) calls run GDINO+SAM once. The reference
            recomputes the same grounding in pre_filter AND the edit
            pipeline (its design flaw, SURVEY §3.1: pre_filter.py:164 +
            tool.py:166 call sites) — grounding is deterministic, so
            memoizing is semantics-preserving. Verify re-detections on
            EDITED images are fresh by construction (new array identity).
        The memo value keeps the image reference so an id() reuse after
        garbage collection can never alias a stale entry.

        Wrapping UNWRAPS any previous executor's layer first (toolboxes
        are shared across executors — e.g. the bench constructs one per
        record): otherwise stale memos of dead executors stack up as
        permanent caches and corrupt both semantics and timings."""
        real = getattr(self.tb.ground, "_real", self.tb.ground)

        def ground(image, phrase, mode="merge", count_k=None):
            k = (id(image), phrase, mode, count_k)
            if k in self._gcache:
                return self._gcache[k]
            hit = self._gmemo.get(k)
            if hit is not None and hit[0] is image:
                return hit[1]
            g = real(image, phrase, mode=mode, count_k=count_k)
            self._gmemo[k] = (image, g)
            return g

        ground._real = real
        ground.batch = getattr(real, "batch", None)
        self.tb.ground = ground

    # ---- default scorers --------------------------------------------------
    def _default_pre_scorer(self, rec, image) -> PreScores:
        """Main pre-gate inputs (reference pre_filter.py:115-188): CLIP
        (image, caption), aesthetic MLP, grounded object-area ratio,
        background VQA for background_change. Fields stay None (permissive)
        only when the corresponding model slot is absent."""
        h, w = image.shape[:2]
        s = PreScores(width=w, height=h)
        if self.tb.clip_image is not None and self.tb.clip_text is not None:
            ie = self._ccache.get(id(image))
            if ie is None:
                ie = np.asarray(self.tb.clip_image(image))
            else:
                ie = np.asarray(ie)
            te = np.asarray(self.tb.clip_text(rec.input))
            s.clip = float((ie * te).sum(-1).squeeze())
        aesthetic = self.tb.extra.get("aesthetic")
        if aesthetic is not None:
            s.aesthetic = float(aesthetic(image))
        # object-area ratio via union_generation (pre_filter.py:164-170)
        if self.tb.ground is not None and rec.edited_object:
            g = self.tb.ground(image, rec.edited_object, mode="merge")
            if g is not None:
                s.object_ratio = float(g.union_ratio)
        if rec.edit_type == "background_change" and self.tb.vqa_yes_no is not None:
            bg = rec.extras.get("new background") or rec.output
            s.background_vqa_ok = not bool(self.tb.vqa_yes_no(
                image, f"Is the background of this image similar to {bg}?"))
        return s

    def _default_post_scorer(self, rec, image, outcome: EditOutcome) -> Scores:
        """Per-type predicate inputs (post_filter.py:15-79): CLIP,
        directional CLIP, pixel L1, detector existence, VQA, OCR match."""
        s = Scores()
        edited = outcome.edited
        if self.tb.clip_image is not None and self.tb.clip_text is not None \
                and edited is not None:
            ie_t = np.asarray(self.tb.clip_image(edited))
            te_t = np.asarray(self.tb.clip_text(rec.output))
            s.clip = float((ie_t * te_t).sum(-1).squeeze())
            # directional CLIP (utils.py:284-301)
            from anyedit_tpu.filters.scorers import directional_clip_score
            src_img = outcome.input_image if outcome.input_image is not None else image
            ie_s = self._ccache.get(id(src_img))
            ie_s = np.asarray(ie_s) if ie_s is not None \
                else np.asarray(self.tb.clip_image(src_img))
            te_s = np.asarray(self.tb.clip_text(rec.input))
            s.dir_clip = float(np.asarray(directional_clip_score(
                ie_s, ie_t, te_s, te_t)).squeeze())
        if edited is not None:
            src_img = outcome.input_image if outcome.input_image is not None else image
            if src_img.shape == edited.shape:
                s.l1 = float(np.mean(np.abs(
                    src_img.astype(np.float32) - edited.astype(np.float32))) / 255.0)
        # detector-based (non-)existence check in the edited image
        # (reference filter_tool/utils.py:212-276 object_detection)
        if self.tb.ground is not None and edited is not None:
            phrase = rec.new_object if rec.edit_type == "replace" else rec.edited_object
            if phrase and rec.edit_type in ("add", "remove", "counting", "replace"):
                g = self.tb.ground(edited, phrase, mode="merge")
                present = g is not None and bool(np.any(np.asarray(g.mask)))
                if present and outcome.mask is not None \
                        and rec.edit_type in ("remove", "counting"):
                    # must overlap the edited region to count (≥0.2 mask-IoU rule)
                    inter = (np.asarray(g.mask) & outcome.mask).sum()
                    present = inter / max(1, np.asarray(g.mask).sum()) >= 0.2
                s.object_present = present
        if edited is not None and self.tb.vqa_yes_no is not None:
            if rec.edit_type == "color_alter":
                # blip2_color (utils.py:55-75): last word of the edit text
                import re
                words = re.findall(r"\w+", rec.edit)
                color = words[-1] if words else ""
                s.vqa_yes = bool(self.tb.vqa_yes_no(
                    edited,
                    f"Is the color of {rec.edited_object} close to {color}?"))
            elif rec.edit_type == "background_change":
                bg = rec.extras.get("new background") or rec.output
                s.vqa_yes = bool(self.tb.vqa_yes_no(
                    edited,
                    f"Is the background of this image similar to {bg}?"))
        if rec.edit_type == "textual_change" and self.tb.ocr is not None \
                and edited is not None and outcome.input_image is not None:
            from anyedit_tpu.filters.scorers import ocr_text_match
            import re
            quoted = re.findall(r'"([^"]+)"', rec.input) or [rec.input]
            quoted_out = re.findall(r'"([^"]+)"', rec.output) or [rec.output]
            s.ocr_match = (
                ocr_text_match(self.tb.ocr(outcome.input_image), quoted[0])
                and ocr_text_match(self.tb.ocr(edited), quoted_out[0]))
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

        bs = self.cfg.grounding_batch
        batched = bs > 0 and getattr(self.tb.ground, "batch", None) is not None
        with trace_ctx:
            if not batched:
                for idx, rec in ledger.pending(records, shard):
                    try:
                        self._run_one(rec, load_image, ledger, out_root)
                    except Exception as e:  # contain per record, keep reason
                        ledger.mark(rec, "failure",
                                    {"error": f"{type(e).__name__}: {e}",
                                     "trace": traceback.format_exc(limit=3)})
            else:
                pending = list(ledger.pending(records, shard))
                chunks = [pending[c0:c0 + bs]
                          for c0 in range(0, len(pending), bs)]
                # double-buffered host IO: decode chunk N+1 on a thread
                # while chunk N runs on-device (SURVEY §7.8)
                import threading

                def load_chunk(chunk):
                    out = {}
                    for idx, rec in chunk:
                        try:
                            out[rec.key()] = load_image(rec)
                        except Exception as e:
                            out[rec.key()] = e
                    return out

                nxt: dict = load_chunk(chunks[0]) if chunks else {}
                for ci, chunk in enumerate(chunks):
                    loaded = nxt
                    th = None
                    if ci + 1 < len(chunks):
                        holder = {}

                        def work(c=chunks[ci + 1], h=holder):
                            h["v"] = load_chunk(c)
                        th = threading.Thread(target=work)
                        th.start()
                    self._run_chunk(chunk, loaded, ledger, out_root, bs)
                    if th is not None:
                        th.join()
                        nxt = holder["v"]
        report = {"counts": ledger.counts(), "stages": self.timer.report()}
        ledger.close()
        return report

    def _run_chunk(self, chunk, preloaded: dict, ledger, out_root,
                   bucket) -> None:
        """Device-batch every batchable first grounding of a preloaded
        chunk, then stream records through their pipelines against the
        warm cache."""
        # memo scope = one chunk here (pre-gate groundings must survive
        # into the records' _run_one passes); the identity guard keeps
        # reuse safe and this clear bounds memory to one chunk's images
        self._gmemo.clear()
        loaded: dict[str, np.ndarray] = {}
        todo = []   # (image, phrase, mode, count_k)
        for idx, rec in chunk:
            img = preloaded.get(rec.key())
            if isinstance(img, Exception):
                ledger.mark(rec, "failure",
                            {"error": f"{type(img).__name__}: {img}"})
                continue
            loaded[rec.key()] = img
            spec = _first_ground_spec(rec)
            if spec is not None:
                todo.append((img,) + spec)
        if todo and self.cfg.batch_grounding:
            try:
                with self.timer.stage("ground_batch"):
                    results = self.tb.ground.batch(
                        [t[0] for t in todo], [t[1] for t in todo],
                        modes=[t[2] for t in todo],
                        count_ks=[t[3] for t in todo], bucket=bucket)
                for (img, phrase, mode, ck), g in zip(todo, results):
                    self._gcache[(id(img), phrase, mode, ck)] = g
            except Exception as e:
                # e.g. the batch-N grounding program OOMs HBM at production
                # shapes — leave _gcache cold; pipelines ground per record
                print(f"# ground_batch fell back to per-record "
                      f"({type(e).__name__}: {str(e)[:200]})",
                      file=sys.stderr, flush=True)
        # ONE CLIP tower forward for the whole chunk's pre-scoring
        clip_batch = getattr(self.tb.clip_image, "batch", None) \
            if self.tb.clip_image is not None else None
        if clip_batch is not None and self.cfg.run_pre_filter and loaded:
            imgs = list(loaded.values())
            try:
                with self.timer.stage("clip_batch"):
                    zs = clip_batch(imgs, bucket=bucket)
                for img, z in zip(imgs, zs):
                    self._ccache[id(img)] = z
            except Exception as e:
                print(f"# clip_batch fell back to per-record "
                      f"({type(e).__name__}: {str(e)[:200]})",
                      file=sys.stderr, flush=True)

        # pre-filter the chunk FIRST (cheap now: grounding + CLIP cached)
        # so the batched edit below only spends device time on survivors —
        # per-record semantics preserved: the same decision on the same
        # scores, in record order, marked to the same ledger
        pre_ok: dict[str, bool] = {}
        if self.cfg.run_pre_filter:
            for idx, rec in chunk:
                if rec.key() not in loaded:
                    continue
                try:
                    with self.timer.stage("pre_filter"):
                        pre_ok[rec.key()] = self._pre_gate(
                            rec, loaded[rec.key()])
                except Exception as e:
                    ledger.mark(rec, "failure",
                                {"error": f"{type(e).__name__}: {e}",
                                 "trace": traceback.format_exc(limit=3)})
                    loaded.pop(rec.key(), None)

        # device-batch the survivors' unmasked full-frame IP2P edits
        # (VERDICT r4 weak #2: the edit stage ran one record at a time
        # while batch-8 was 2.7× faster per pair)
        if self.cfg.batch_edits \
                and getattr(self.tb, "ip2p", None) is not None \
                and getattr(self.tb.ip2p, "batch", None) is not None:
            groups: dict[tuple, list] = {}
            for idx, rec in chunk:
                img = loaded.get(rec.key())
                spec = _IP2P_EDIT.get(rec.edit_type)
                if img is None or spec is None \
                        or pre_ok.get(rec.key(), True) is False:
                    continue
                gspec = _first_ground_spec(rec)
                if gspec is not None:
                    # a failed (cached) first grounding means the pipeline
                    # exits before its edit call — don't batch-edit it
                    gkey = (id(img),) + gspec
                    g = self._gcache.get(gkey, _NO_CACHE)
                    if g is not _NO_CACHE and (
                            g is None or
                            not bool(np.any(np.asarray(g.mask)))):
                        continue
                steps, s_txt, s_img = spec
                if self.cfg.ip2p_steps_override:
                    steps = self.cfg.ip2p_steps_override
                groups.setdefault((steps, s_txt, s_img), []) \
                      .append((img, rec))
            for (steps, s_txt, s_img), items in groups.items():
                try:
                    with self.timer.stage("edit_batch"):
                        outs = self.tb.ip2p.batch(
                            [im for im, _ in items],
                            [r.edit for _, r in items],
                            steps=steps, s_txt=s_txt, s_img=s_img,
                            seeds=[0] * len(items))
                except Exception as e:
                    # a failed batch program (e.g. HBM OOM at this bucket)
                    # must not fail the chunk's records: leave _ecache cold
                    # so _run_one edits them one at a time below
                    print(f"# edit_batch fell back to per-record "
                          f"({type(e).__name__}: {str(e)[:200]})",
                          file=sys.stderr, flush=True)
                    continue
                for (im, r), o in zip(items, outs):
                    self._ecache[(id(im), r.edit, steps, s_txt, s_img, 0)] = o

        for idx, rec in chunk:
            if rec.key() not in loaded:
                continue
            try:
                self._run_one(rec, lambda r: loaded[r.key()], ledger,
                              out_root, pre_ok=pre_ok.get(rec.key()),
                              keep_memo=True)
            except Exception as e:
                ledger.mark(rec, "failure",
                            {"error": f"{type(e).__name__}: {e}",
                             "trace": traceback.format_exc(limit=3)})
        self._gcache.clear()
        self._ccache.clear()
        self._ecache.clear()

    def _pre_gate(self, rec: InstructionRecord, image) -> bool:
        """The pre-filter decision exactly as _run_one makes it: same
        scores, same deterministic rng draw (host_rng is keyed by
        (seed, record key), so the chunk phase and the per-record path
        compute the identical uniform)."""
        rng = host_rng(self.cfg.seed, rec.key())
        ps = self.pre_scorer(rec, image)
        return pre_filter_decision(rec.edit_type, ps,
                                   edited_object=rec.edited_object or "",
                                   rng_uniform=float(rng.uniform()))

    def _run_one(self, rec: InstructionRecord, load_image, ledger: RunLedger,
                 out_root: Path, pre_ok: Optional[bool] = None,
                 keep_memo: bool = False) -> None:
        if not keep_memo:
            # record-scoped in the per-record loop; chunk mode clears at
            # chunk boundaries instead — the pre-gate grounds BEFORE
            # _run_one there, and clearing here discarded that work, so
            # every pipeline re-ground the same (image, phrase): one extra
            # GDINO+SAM pass per record whenever batch_grounding was off
            # (found via the 2026-08-20 prod bench's edit-stage misses).
            # Entries are image-identity-guarded, so correctness never
            # depended on the clear — only memory reclamation does.
            self._gmemo.clear()
        rng = host_rng(self.cfg.seed, rec.key())
        with self.timer.stage("load"):
            image = load_image(rec)

        if self.cfg.run_pre_filter:
            if pre_ok is None:
                with self.timer.stage("pre_filter"):
                    ok = self._pre_gate(rec, image)
            else:
                ok = pre_ok
            # keep the pipeline's rng stream identical whether the gate
            # ran here or in the chunk phase: the decision consumed the
            # stream's first uniform either way
            rng.uniform()
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
            if outcome.visual_input is not None:
                # the visual_* families' PRODUCT is the condition channel
                # (visual_condition_tool.py saves it alongside the pair)
                vdir = out_root / "visual_input"
                vdir.mkdir(parents=True, exist_ok=True)
                vp = vdir / f"{stem}.png"
                vi = outcome.visual_input
                if vi.dtype != np.uint8:
                    vi = np.clip(np.asarray(vi, np.float32), 0, 255).astype(np.uint8)
                Image.fromarray(vi).save(vp)
                rec.visual_input = vp.name
                payload["visual_input_file"] = str(vp)
        ledger.mark(rec, "success", payload)
