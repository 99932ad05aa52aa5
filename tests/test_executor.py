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
