"""`anyedit_tpu train` end-to-end: mixture dataset from a success ledger →
2 tiny training steps → Orbax checkpoint → resume continues from step 2
(the reference's train.py:496-751 loop + --resume_from_checkpoint latest).
"""

import json

import numpy as np
import pytest

from anyedit_tpu.cli import main as cli_main
from anyedit_tpu.train.data import (
    MixtureSampler, examples_from_ledger, TrainExample,
)
from anyedit_tpu.core.schema import InstructionRecord


def _make_ledger(tmp_path, n=6):
    from PIL import Image
    img_root = tmp_path / "imgs"
    img_root.mkdir()
    rows = []
    rng = np.random.default_rng(0)
    types = ["color_alter", "remove", "add"]
    for i in range(n):
        a = img_root / f"in_{i}.png"
        b = img_root / f"ed_{i}.png"
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(a)
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(b)
        rec = InstructionRecord(edit=f"edit {i}", input="a", output="b",
                                edit_type=types[i % 3],
                                image_file=str(a)).to_json()
        rows.append({"key": f"k{i}", "status": "success", "record": rec,
                     "payload": {"edited_file": str(b),
                                 "input_file": str(a)}})
    led = tmp_path / "ledger.jsonl"
    led.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return led


def test_examples_and_mixture(tmp_path):
    led = _make_ledger(tmp_path)
    exs = examples_from_ledger(led)
    assert len(exs) == 6
    sampler = MixtureSampler(exs, seed=0)
    assert set(sampler.buckets) == {"color_alter", "remove", "add"}
    # rebalancing: zero weight removes a bucket from the draw
    s2 = MixtureSampler(exs, weights={"remove": 0.0, "add": 0.0,
                                      "color_alter": 1.0}, seed=0)
    for _ in range(8):
        assert s2.sample().record.edit_type == "color_alter"


def test_train_cli_checkpoints_and_resumes(tmp_path, capsys):
    led = _make_ledger(tmp_path)
    ck = tmp_path / "ckpt"
    args = ["train", "--ledger", str(led), "--steps", "2",
            "--batch-size", "2", "--resolution", "32", "--tiny",
            "--checkpoint-dir", str(ck), "--checkpoint-every", "1",
            "--log-every", "1"]
    assert cli_main(args) == 0
    out = capsys.readouterr().out
    final = json.loads(out.strip().splitlines()[-1])
    assert final["final_step"] == 2 and np.isfinite(final["mean_loss"])
    assert any(ck.iterdir()), "no checkpoint written"

    # resume: runs only the remaining steps (2 → 4)
    args2 = [a if a != "2" else "4" for a in args] + ["--resume"]
    # (replace the steps value precisely)
    args2 = ["train", "--ledger", str(led), "--steps", "4",
             "--batch-size", "2", "--resolution", "32", "--tiny",
             "--checkpoint-dir", str(ck), "--checkpoint-every", "1",
             "--log-every", "1", "--resume"]
    assert cli_main(args2) == 0
    out2 = capsys.readouterr().out
    assert "resumed from step 2" in out2
    final2 = json.loads(out2.strip().splitlines()[-1])
    assert final2["final_step"] == 4
