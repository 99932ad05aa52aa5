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
