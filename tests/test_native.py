import json

import numpy as np
import pytest

from anyedit_tpu.native import (
    load_native, jsonl_index, read_record, ledger_counts, ShardedJsonlReader,
)


@pytest.fixture(scope="module")
def jsonl_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("native") / "stream.jsonl"
    with p.open("w") as f:
        for i in range(100):
            f.write(json.dumps({"edit": f"edit {i}", "idx": i}) + "\n")
            if i == 50:
                f.write("\n")  # blank line must be skipped
    return p


def test_native_builds():
    assert load_native() is not None, "C++ lib should compile in this image"


def test_index_and_read(jsonl_file):
    idx = jsonl_index(jsonl_file)
    assert idx.shape == (100, 2)
    rec = read_record(jsonl_file, int(idx[42, 0]), int(idx[42, 1]))
    assert rec == {"edit": "edit 42", "idx": 42}
    rec0 = read_record(jsonl_file, int(idx[0, 0]), int(idx[0, 1]))
    assert rec0["idx"] == 0
    rec99 = read_record(jsonl_file, int(idx[99, 0]), int(idx[99, 1]))
    assert rec99["idx"] == 99


def test_index_matches_python_fallback(jsonl_file):
    import anyedit_tpu.native as nat
    native_idx = jsonl_index(jsonl_file)
    lib, tried = nat._lib, nat._tried
    nat._lib, nat._tried = None, True      # force fallback
    try:
        py_idx = jsonl_index(jsonl_file)
    finally:
        nat._lib, nat._tried = lib, tried
    np.testing.assert_array_equal(native_idx, py_idx)


def test_sharded_reader(jsonl_file):
    r = ShardedJsonlReader(jsonl_file)
    assert len(r) == 100
    assert r[7]["idx"] == 7
    rec = r.record(3)
    assert rec.edit == "edit 3"


def test_ledger_scan(tmp_path):
    p = tmp_path / "ledger.jsonl"
    with p.open("w") as f:
        for s in ["success"] * 5 + ["failure"] * 2 + ["filtered"] * 3:
            f.write(json.dumps({"key": "k", "status": s}) + "\n")
    c = ledger_counts(p)
    assert c == {"success": 5, "failure": 2, "filtered": 3, "total": 10}
