import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyedit_tpu.core.schema import InstructionRecord, read_records, write_records
from anyedit_tpu.core.ledger import RunLedger, Shard
from anyedit_tpu.core import config as cfg
from anyedit_tpu.core.mesh import make_mesh, MeshSpec, shard_batch
from anyedit_tpu.core.rng import record_key, host_rng


REF_JSON = {
    "edit": "change the airplane to green",
    "edited object": "airplane",
    "input": "a small airplane sits stationary on a piece of concrete.",
    "output": "A green small airplane sits stationary on a piece of concrete.",
    "edit_type": "color_alter",
    "visual_input": "None",
    "image_file": "COCO_train2014_000000521165.jpg",
    "edited_file": "xxxxx.png",
}


def test_schema_roundtrip():
    rec = InstructionRecord.from_json(REF_JSON)
    assert rec.edited_object == "airplane"
    assert rec.visual_input is None  # "None"-string decoded
    back = rec.to_json()
    assert back == REF_JSON


def test_schema_extras_preserved():
    obj = dict(REF_JSON, edit_type="replace", **{"new object": "boat"}, custom=1)
    rec = InstructionRecord.from_json(obj)
    assert rec.new_object == "boat"
    assert rec.extras == {"custom": 1}
    assert rec.to_json()["new object"] == "boat"


def test_jsonl_and_array_io(tmp_path):
    recs = [InstructionRecord.from_json(REF_JSON) for _ in range(3)]
    write_records(tmp_path / "a.jsonl", recs)
    write_records(tmp_path / "a.json", recs)
    assert len(read_records(tmp_path / "a.jsonl")) == 3
    assert len(read_records(tmp_path / "a.json")) == 3


def test_shard_split():
    s0 = Shard(index=0, count=3).slice(10)
    s1 = Shard(index=1, count=3).slice(10)
    s2 = Shard(index=2, count=3).slice(10)
    assert list(s0) + list(s1) + list(s2) == list(range(10))
    assert list(Shard(start=2, end=5).slice(10)) == [2, 3, 4]


def test_ledger_resume(tmp_path):
    recs = [InstructionRecord.from_json(dict(REF_JSON, edit=f"e{i}")) for i in range(5)]
    led = RunLedger(tmp_path / "run.jsonl")
    led.mark(recs[0], "success", {"clip": 0.3})
    led.mark(recs[1], "failure")
    led.close()
    led2 = RunLedger(tmp_path / "run.jsonl")
    pend = [i for i, _ in led2.pending(recs)]
    assert pend == [2, 3, 4]
    assert led2.counts()["success"] == 1
    led2.export_reference_files(tmp_path / "out", 0, 5)
    succ = json.loads((tmp_path / "out" / "edit_success_0_5.json").read_text())
    assert len(succ) == 1


def test_config_presets():
    c = cfg.task_config("color_alter")
    assert c.diffusion.num_steps == 100
    assert c.diffusion.image_guidance_scale == 0.9
    c2 = cfg.task_config("material_transfer")
    assert c2.canvas.edit_size == 1024
    with pytest.raises(KeyError):
        cfg.from_dict(cfg.CanvasConfig, {"bogus": 1})


def test_mesh_and_sharding(mesh8):
    assert mesh8.devices.shape == (2, 2, 2)
    x = np.zeros((8, 4), np.float32)
    xs = shard_batch(mesh8, x)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("dp")

    spec = MeshSpec.auto(8)
    assert spec.size == 8 and spec.tp == 2 and spec.ep == 2


def test_rng_determinism():
    k1 = record_key(0, "a")
    k2 = record_key(0, "a")
    assert jnp.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))
    g = host_rng(0, "a")
    g2 = host_rng(0, "a")
    assert g.integers(0, 1 << 30) == g2.integers(0, 1 << 30)
