"""`anyedit_tpu distill` end-to-end: success ledger → LCM distillation →
`unet_ip2p_lcm.msgpack` + Orbax resume + teacher-vs-student eval run dirs
scoreable by `anyedit_tpu eval`.

This is the production entry for the few-step fast mode (VERDICT r4 #1):
the reference's WYS-IP2P editor (global_tool.py:105-192) has no
distillation; here the student checkpoint the zoo's --lcm-steps mode
consumes (runtime/zoo.py:_ip2p_core) must be PRODUCIBLE from a factory
ledger with one command, with resumable training and a quality readout.
"""

import json

import jax
import numpy as np
import pytest

from anyedit_tpu.cli import main as cli_main
from tests.test_train_cli import _make_ledger

DISTILL_ARGS = [
    "distill", "--steps", "2", "--batch-size", "2", "--resolution", "32",
    "--tiny", "--ddim-steps", "4", "--lcm-steps", "2", "--lr", "1e-3",
    "--guidance", "2.0", "--image-guidance", "1.0",
    "--checkpoint-every", "1", "--log-every", "1",
]


def _last_json(capsys):
    """Parse the trailing (multi-line, indent=1) JSON report."""
    out = capsys.readouterr().out
    start = out.rindex("\n{") + 1 if "\n{" in out else out.index("{")
    return json.loads(out[start:])


def test_distill_cli_writes_student_and_eval_dirs(tmp_path, capsys):
    led = _make_ledger(tmp_path)
    ck = tmp_path / "dck"
    out = tmp_path / "w" / "unet_ip2p_lcm.msgpack"
    args = DISTILL_ARGS + ["--ledger", str(led), "--checkpoint-dir",
                           str(ck), "--eval-count", "2", "--out", str(out)]
    assert cli_main(args) == 0
    report = _last_json(capsys)
    assert out.exists(), "student checkpoint not written"
    assert np.isfinite(report["mean_loss"])

    q = report["quality"]
    assert q["pairs"] == 2
    assert q["teacher_steps"] == 4 and q["student_steps"] == 2
    for k in ("latent_l1_teacher_vs_student",
              "pixel_l1_teacher_vs_student", "pixel_l1_teacher_vs_orig"):
        assert np.isfinite(q[k]), k

    # the student msgpack is the EMA tree and round-trips through the
    # flax loader the zoo uses
    from flax.serialization import msgpack_restore
    tree = msgpack_restore(out.read_bytes())
    assert "params" in tree

    # both eval run dirs are real `run` output shapes: ledger + images,
    # consumable by run_dir_entries/default_loader (→ `anyedit_tpu eval`)
    from anyedit_tpu.runtime.evaluate import default_loader, run_dir_entries
    from anyedit_tpu.core.schema import InstructionRecord
    for name in ("eval_teacher", "eval_student"):
        d = ck / name
        entries = run_dir_entries(d)
        assert len(entries) == 2, name
        loader = default_loader(d, None)
        rec = InstructionRecord.from_json(entries[0]["record"])
        src, dst = loader(rec, entries[0]["payload"])
        assert src.shape == (32, 32, 3) and dst.shape == (32, 32, 3)
    # matched record sets: same records, different editors
    t0 = run_dir_entries(ck / "eval_teacher")[0]["record"]
    s0 = run_dir_entries(ck / "eval_student")[0]["record"]
    assert t0 == s0


def test_distill_cli_resumes(tmp_path, capsys):
    led = _make_ledger(tmp_path)
    ck = tmp_path / "dck"
    base = DISTILL_ARGS + ["--ledger", str(led), "--checkpoint-dir",
                           str(ck), "--eval-count", "0",
                           "--out", str(tmp_path / "s.msgpack")]
    assert cli_main(base) == 0
    capsys.readouterr()
    args2 = [("4" if a == "2" and base[base.index(a) - 1] == "--steps"
              else a) for a in base]
    args2[args2.index("--steps") + 1] = "4"
    assert cli_main(args2 + ["--resume"]) == 0
    out2 = capsys.readouterr().out
    assert "resumed from step 2" in out2
    assert json.loads(out2[out2.rindex("\n{") + 1:])["final_step"] == 4


def test_distilled_student_feeds_zoo_lcm_mode(tmp_path, capsys):
    """The produced msgpack is what `run --lcm-steps` loads: ModelZoo's
    _ip2p_core prefers it over the teacher slot, leaf-for-leaf."""
    import dataclasses

    from anyedit_tpu.cli import tiny_zoo_config
    from anyedit_tpu.runtime.zoo import ModelZoo

    led = _make_ledger(tmp_path)
    wdir = tmp_path / "weights"
    wdir.mkdir()
    out = wdir / "unet_ip2p_lcm.msgpack"
    args = DISTILL_ARGS + ["--ledger", str(led), "--checkpoint-dir",
                           str(tmp_path / "dck"), "--eval-count", "0",
                           "--out", str(out)]
    assert cli_main(args) == 0
    capsys.readouterr()

    cfg = dataclasses.replace(tiny_zoo_config(), lcm_steps=2)
    zoo = ModelZoo(cfg, weights_dir=wdir, allow_fallback_tokenizers=True)
    _, loaded, _ = zoo._ip2p_core()
    from flax.serialization import msgpack_restore
    want = msgpack_restore(out.read_bytes())
    lw = jax.tree_util.tree_leaves(want)
    ll = jax.tree_util.tree_leaves(loaded)
    assert len(lw) == len(ll)
    np.testing.assert_array_equal(np.asarray(ll[0]), np.asarray(lw[0]))

    # and the editor actually runs few-step edits with it
    img = np.random.default_rng(0).integers(
        0, 255, (48, 48, 3), np.uint8)
    edit = zoo.ip2p()
    res = edit(img, "make it red", None, steps=50, seed=0)
    assert res.shape == (48, 48, 3) and res.dtype == np.uint8


def test_distill_requires_teacher_weights(tmp_path):
    """--require-weights + no unet_ip2p.msgpack must fail loudly, never
    silently distill from a random teacher."""
    led = _make_ledger(tmp_path)
    wdir = tmp_path / "empty_weights"
    wdir.mkdir()
    args = DISTILL_ARGS + ["--ledger", str(led), "--checkpoint-dir",
                           str(tmp_path / "dck"), "--eval-count", "0",
                           "--weights-dir", str(wdir), "--require-weights"]
    with pytest.raises(FileNotFoundError):
        cli_main(args)
