"""`anyedit_tpu eval` — dataset-quality metrics over a finished run.

Drives a tiny run (save_images=True) and then the eval harness over its
ledger; checks the metric structure, value ranges, and the post-filter
pass-rate wiring (runtime/evaluate.py; reference operational definition:
filter_tool/post_filter.py:15-79 + utils.py scorers).
"""

import json

import numpy as np
import pytest
from PIL import Image



def _make_run(tmp_path):
    from anyedit_tpu.cli import main as cli_main
    img_root = tmp_path / "imgs"
    img_root.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(
        img_root / "a.png")
    # tone_transfer: full-image ip2p, no grounding — deterministic success
    # at random weights (color_alter would fail on "object not found")
    rec = {"edit": "make it warmer", "input": "a photo",
           "output": "a warm photo", "edit_type": "tone_transfer",
           "edited object": None, "image_file": "a.png"}
    inst = tmp_path / "inst.jsonl"
    inst.write_text(json.dumps(rec) + "\n")
    out = tmp_path / "out"
    rc = cli_main(["run", "--instruction-json", str(inst), "--image-root",
                   str(img_root), "--output", str(out), "--tiny",
                   "--no-filters"])
    assert rc == 0
    return img_root, out


def test_eval_cli_over_tiny_run(tmp_path):
    from anyedit_tpu.cli import main as cli_main
    img_root, out = _make_run(tmp_path)
    led = [json.loads(l) for l in open(out / "ledger.jsonl")]
    assert any(e["status"] == "success" for e in led), led
    ev = tmp_path / "eval.json"
    rc = cli_main(["eval", "--run-dir", str(out), "--image-root",
                   str(img_root), "--output", str(ev), "--tiny"])
    assert rc == 0
    rep = json.loads(ev.read_text())
    assert rep["overall"]["count"] >= 1
    assert "tone_transfer" in rep["per_type"]
    pair = rep["pairs"][0]
    assert 0.0 <= pair["l1"] <= 1.0
    assert -1.0 <= pair["ssim"] <= 1.0
    assert -1.0 <= pair["clip_out"] <= 1.0
    assert -1.0 <= pair["dino_sim"] <= 1.0 + 1e-6
    assert pair["passes"] in (True, False)
    assert 0.0 <= rep["overall"]["pass_rate"] <= 1.0


def test_evaluate_pairs_synthetic():
    """Harness math sanity without a run: identical pair → l1=0, ssim=1."""
    from anyedit_tpu.core.schema import InstructionRecord
    from anyedit_tpu.runtime.evaluate import evaluate_pairs

    class TB:
        clip_image = None
        clip_text = None

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (24, 24, 3), np.uint8)
    rec = InstructionRecord(edit="e", input="i", output="o",
                            edit_type="tone_transfer", image_file="x.png")
    entries = [{"key": rec.key(), "record": rec.to_json(), "payload": {}}]
    rep = evaluate_pairs(TB(), entries, lambda r, p: (img, img.copy()))
    m = rep["pairs"][0]
    assert m["l1"] == 0.0
    assert m["ssim"] == pytest.approx(1.0, abs=1e-5)
    assert rep["per_type"]["tone_transfer"]["count"] == 1
