import numpy as np

from anyedit_tpu.core.schema import InstructionRecord
from anyedit_tpu.core.ledger import Shard
from anyedit_tpu.runtime.executor import FactoryExecutor, ExecutorConfig
from tests.test_edits import make_toolbox, scene_with_red_square, GRASS


def _records(n=4):
    return [InstructionRecord(
        edit=f"remove the red square {i}", input="a red square on grass",
        output="grass", edit_type="remove", edited_object="red square",
        image_file=f"img_{i}.jpg") for i in range(n)]


def _loader(rec):
    if rec.image_file == "img_2.jpg":
        return np.tile(GRASS, (64, 64, 1))  # no object → pipeline failure
    return scene_with_red_square()


def test_executor_end_to_end(tmp_path):
    tb = make_toolbox()
    ex = FactoryExecutor(tb, ExecutorConfig(output_root=str(tmp_path)))
    report = ex.run(_records(), _loader)
    assert report["counts"]["success"] == 3
    assert report["counts"]["failure"] == 1
    # images written + stage timings collected
    assert len(list((tmp_path / "edited_img").glob("*.png"))) == 3
    assert "edit/remove" in report["stages"]
    assert report["stages"]["edit/remove"]["count"] == 4


def test_executor_resume_and_shard(tmp_path):
    tb = make_toolbox()
    recs = _records(6)
    ex = FactoryExecutor(tb, ExecutorConfig(output_root=str(tmp_path)))
    ex.run(recs, _loader, shard=Shard(index=0, count=2))
    ex2 = FactoryExecutor(tb, ExecutorConfig(output_root=str(tmp_path)))
    report = ex2.run(recs, _loader)  # resume: only shard-1 records remain
    total = sum(report["counts"].values())
    assert total == 6  # ledger counts everything, including shard-0's work
    assert report["stages"]["edit/remove"]["count"] == 3  # only 3 ran now


def test_executor_contains_crashes(tmp_path):
    tb = make_toolbox()

    def exploding_ground(image, phrase, **kw):
        raise RuntimeError("boom")

    tb.ground = exploding_ground
    ex = FactoryExecutor(tb, ExecutorConfig(output_root=str(tmp_path)))
    report = ex.run(_records(2), _loader)
    assert report["counts"]["failure"] == 2  # contained, with reasons


def test_executor_pre_filter_gate(tmp_path):
    tb = make_toolbox()
    ex = FactoryExecutor(
        tb, ExecutorConfig(output_root=str(tmp_path)),
        pre_scorer=lambda rec, img: __import__(
            "anyedit_tpu.filters.pre_filter", fromlist=["PreScores"]
        ).PreScores(width=2000, height=300))  # aspect > 2 → reject
    report = ex.run(_records(2), _loader)
    assert report["counts"]["filtered"] == 2


def test_executor_batched_grounding_equivalent(tmp_path):
    """grounding_batch mode must produce the same ledger outcomes as the
    per-record loop, and the stage report must show the batched stage."""
    from anyedit_tpu.runtime.executor import _first_ground_spec

    recs = _records(5)
    tb_a = make_toolbox()
    ex_a = FactoryExecutor(tb_a, ExecutorConfig(output_root=str(tmp_path / "a")))
    rep_a = ex_a.run(recs, _loader)

    tb_b = make_toolbox()
    calls = {"n": 0}
    real_ground = tb_b.ground

    def counting_ground(image, phrase, mode="merge", count_k=None):
        calls["n"] += 1
        return real_ground(image, phrase, mode=mode, count_k=count_k)

    def ground_batch(images, phrases, modes=None, count_ks=None, bucket=8):
        return [real_ground(i, p, mode=m, count_k=k) for i, p, m, k in
                zip(images, phrases, modes or ["merge"] * len(images),
                    count_ks or [None] * len(images))]

    counting_ground.batch = ground_batch
    tb_b.ground = counting_ground
    ex_b = FactoryExecutor(tb_b, ExecutorConfig(
        output_root=str(tmp_path / "b"), grounding_batch=4))
    rep_b = ex_b.run(recs, _loader)

    assert rep_a["counts"] == rep_b["counts"]
    assert "ground_batch" in rep_b["stages"]
    # cached first groundings: live calls only for verify re-detections
    assert calls["n"] < 2 * len(recs)
    # spec covers the remove family used here
    assert _first_ground_spec(recs[0]) == ("red square", "merge", None)


def test_executor_saves_visual_input_channel(tmp_path):
    """visual_* pipelines' product is the condition channel — it must be
    written and recorded (visual_condition_tool.py saves it per record)."""
    from anyedit_tpu.core.schema import InstructionRecord
    from anyedit_tpu.edits.types import EditOutcome

    tb = make_toolbox()
    rec = InstructionRecord(edit="follow the [sketch]", input="a",
                            output="b", edit_type="visual_sketch",
                            edited_object="red square",
                            image_file="img_0.jpg")
    ex = FactoryExecutor(tb, ExecutorConfig(output_root=str(tmp_path),
                                            run_pre_filter=False,
                                            run_post_filter=False))
    report = ex.run([rec], _loader)
    assert report["counts"]["success"] == 1
    vis = list((tmp_path / "visual_input").glob("*.png"))
    assert len(vis) == 1
    assert rec.visual_input == vis[0].name


def test_executor_batched_clip_scoring(tmp_path):
    """In grounding_batch mode, pre-score CLIP image embeddings come from
    ONE batched tower forward per chunk (clip_batch stage) and equal the
    per-record embeddings."""
    recs = _records(4)
    tb = make_toolbox()
    single_calls = {"n": 0}

    def clip_image(image_u8):
        single_calls["n"] += 1
        return np.asarray([np.float32(image_u8.mean()) / 255.0,
                           np.float32(1.0)])[None]

    def clip_image_batch(images, bucket=8):
        return [np.asarray([np.float32(i.mean()) / 255.0,
                            np.float32(1.0)])[None] for i in images]

    clip_image.batch = clip_image_batch
    tb.clip_image = clip_image
    tb.clip_text = lambda s: np.asarray([[0.5, 0.5]], np.float32)
    real_ground = tb.ground

    def g(image, phrase, mode="merge", count_k=None):
        return real_ground(image, phrase, mode=mode, count_k=count_k)

    g.batch = lambda images, phrases, modes=None, count_ks=None, bucket=8: [
        real_ground(i, p, mode=m, count_k=k) for i, p, m, k in
        zip(images, phrases, modes or ["merge"] * len(images),
            count_ks or [None] * len(images))]
    tb.ground = g
    ex = FactoryExecutor(tb, ExecutorConfig(
        output_root=str(tmp_path), grounding_batch=4))
    rep = ex.run(recs, _loader)
    assert "clip_batch" in rep["stages"]
    # pre-score + post-score source embeds come from the chunk cache;
    # only the EDITED images (3 successes) need live tower calls
    assert single_calls["n"] == 3


def _ground_with_batch(tb):
    real_ground = tb.ground

    def g(image, phrase, mode="merge", count_k=None):
        return real_ground(image, phrase, mode=mode, count_k=count_k)

    g.batch = lambda images, phrases, modes=None, count_ks=None, bucket=8: [
        real_ground(i, p, mode=m, count_k=k) for i, p, m, k in
        zip(images, phrases, modes or ["merge"] * len(images),
            count_ks or [None] * len(images))]
    tb.ground = g
    return tb


def _color_records(n=5):
    return [InstructionRecord(
        edit=f"make the square blue {i}", input="a red square on grass",
        output="a blue square on grass", edit_type="color_alter",
        edited_object="red square", image_file=f"img_{i}.jpg")
        for i in range(n)]


def test_executor_batched_edit_stage(tmp_path):
    """Chunk mode must route the unmasked full-frame IP2P edits of
    pre-filter survivors through ONE batch program (edit_batch stage),
    serve the per-record calls from cache, and produce outcomes identical
    to the per-record loop (VERDICT r4 weak #2: the 2.7x edit-stage gap)."""
    recs = _color_records(5)

    def instrument_ip2p(tb, per_calls, batch_calls):
        real = tb.ip2p

        def ip2p(image, instruction, mask01, steps=50, s_txt=8.0,
                 s_img=0.9, **kw):
            per_calls.append(instruction)
            return real(image, instruction, mask01, steps, s_txt, s_img)

        def batch(images, instructions, masks=None, steps=50, s_txt=8.0,
                  s_img=0.9, seeds=None):
            batch_calls.append(list(instructions))
            return [real(im, ins, None, steps, s_txt, s_img)
                    for im, ins in zip(images, instructions)]

        ip2p.batch = batch
        tb.ip2p = ip2p

    # reference: per-record loop
    tb_a = make_toolbox()
    per_a, bat_a = [], []
    instrument_ip2p(tb_a, per_a, bat_a)
    del tb_a.ip2p.batch  # plain per-record editor
    ex_a = FactoryExecutor(tb_a, ExecutorConfig(
        output_root=str(tmp_path / "a")))
    rep_a = ex_a.run(recs, _loader)
    # record 2 has no object → its pipeline fails before the edit call
    assert len(per_a) == 4 and not bat_a

    # chunked: edits precomputed in one batch call per (steps, scales)
    tb_b = _ground_with_batch(make_toolbox())
    per_b, bat_b = [], []
    instrument_ip2p(tb_b, per_b, bat_b)
    ex_b = FactoryExecutor(tb_b, ExecutorConfig(
        output_root=str(tmp_path / "b"), grounding_batch=8))
    rep_b = ex_b.run(recs, _loader)

    assert rep_a["counts"] == rep_b["counts"]
    assert "edit_batch" in rep_b["stages"]
    # ONE batch, record order, minus record 2 (cached grounding failed →
    # its pipeline never reaches the edit; no batch compute wasted on it)
    assert bat_b == [[r.edit for i, r in enumerate(recs) if i != 2]]
    assert per_b == []                          # every per-record call hit
    # identical pixels either way
    for p in (tmp_path / "a" / "edited_img").glob("*.png"):
        from PIL import Image
        a = np.asarray(Image.open(p))
        b = np.asarray(Image.open(tmp_path / "b" / "edited_img" / p.name))
        np.testing.assert_array_equal(a, b)


def test_executor_batched_edit_skips_prefiltered(tmp_path):
    """Records the pre-gate drops must not spend batched edit compute."""
    from anyedit_tpu.filters.pre_filter import PreScores

    recs = _color_records(4)
    tb = _ground_with_batch(make_toolbox())
    batch_calls = []
    real = tb.ip2p

    def ip2p(image, instruction, mask01, steps=50, s_txt=8.0, s_img=0.9,
             **kw):
        return real(image, instruction, mask01, steps, s_txt, s_img)

    def batch(images, instructions, masks=None, steps=50, s_txt=8.0,
              s_img=0.9, seeds=None):
        batch_calls.append(list(instructions))
        return [real(im, ins, None, steps, s_txt, s_img)
                for im, ins in zip(images, instructions)]

    ip2p.batch = batch
    tb.ip2p = ip2p

    # reject records 0 and 2 at the pre-gate (aspect ratio > 2)
    def pre_scorer(rec, img):
        bad = rec.image_file in ("img_0.jpg", "img_2.jpg")
        return PreScores(width=2000 if bad else 300, height=300)

    ex = FactoryExecutor(tb, ExecutorConfig(
        output_root=str(tmp_path), grounding_batch=8,
        run_post_filter=False),
        pre_scorer=pre_scorer)
    rep = ex.run(recs, _loader)
    assert rep["counts"]["filtered"] == 2
    assert rep["counts"]["success"] == 2
    assert batch_calls == [[recs[1].edit, recs[3].edit]]


def test_executor_grounding_memo_within_record(tmp_path):
    """pre_filter and the edit pipeline ground the SAME (image, phrase)
    within one record pass — the executor must run GDINO+SAM once per
    unique (image, phrase, mode), keeping verify re-detections on edited
    arrays fresh (VERDICT r4 weak #3; reference recomputes: SURVEY §3.1)."""
    recs = _color_records(2)
    tb = make_toolbox()
    live = []
    real_ground = tb.ground

    def counting(image, phrase, mode="merge", count_k=None):
        live.append((id(image), phrase, mode))
        return real_ground(image, phrase, mode=mode, count_k=count_k)

    tb.ground = counting
    ex = FactoryExecutor(tb, ExecutorConfig(
        output_root=str(tmp_path), run_post_filter=False))
    rep = ex.run(recs, _loader)
    assert rep["counts"]["success"] == 2
    # per record: ONE live grounding serves pre_filter's object-ratio
    # gate AND color_alter's mask — not two (ids can repeat across
    # records — the allocator may reuse a freed image's address; the
    # memo's image-reference identity guard is what makes that safe)
    assert len(live) == 2, live

    # a SECOND executor over the same toolbox must not inherit the first
    # executor's memo (stale-cache hazard: toolboxes are shared)
    ex2 = FactoryExecutor(tb, ExecutorConfig(
        output_root=str(tmp_path / "again"), run_post_filter=False))
    ex2.run(recs, _loader)
    assert len(live) == 4, "second run must re-ground, not serve stale"
    # and wrapping stays one layer deep
    assert not hasattr(ex2.tb.ground._real, "_real")


def test_executor_batch_program_failure_falls_back(tmp_path):
    """A failed batch program (e.g. HBM OOM at the chosen bucket — the
    2026-08-20 production bench hit exactly this) must degrade to the
    per-record path with IDENTICAL ledger outcomes, not fail the chunk's
    records."""
    recs = _color_records(5)

    def boom(*a, **kw):
        raise RuntimeError("RESOURCE_EXHAUSTED: hbm")

    # control: working batch programs
    tb0 = _ground_with_batch(make_toolbox())
    ex0 = FactoryExecutor(tb0, ExecutorConfig(
        output_root=str(tmp_path / "c"), grounding_batch=8))
    want = ex0.run(recs, _loader)["counts"]
    assert sum(want.values()) == 5

    # batched grounding raises → per-record grounding serves the records
    tb = _ground_with_batch(make_toolbox())
    tb.ground.batch = boom
    ex = FactoryExecutor(tb, ExecutorConfig(
        output_root=str(tmp_path / "g"), grounding_batch=8))
    rep = ex.run(recs, _loader)
    assert rep["counts"] == want

    # batched edit raises → per-record ip2p edits the survivors
    tb2 = _ground_with_batch(make_toolbox())
    per_calls = []
    real = tb2.ip2p

    def ip2p(image, instruction, mask01, steps=50, s_txt=8.0, s_img=0.9,
             **kw):
        per_calls.append(instruction)
        return real(image, instruction, mask01, steps, s_txt, s_img)

    ip2p.batch = boom
    tb2.ip2p = ip2p
    ex2 = FactoryExecutor(tb2, ExecutorConfig(
        output_root=str(tmp_path / "e"), grounding_batch=8))
    rep2 = ex2.run(recs, _loader)
    assert rep2["counts"] == want
    assert len(per_calls) > 0                  # edits ran per record
