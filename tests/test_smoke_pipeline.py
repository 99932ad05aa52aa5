"""Fast smoke: a REPRESENTATIVE pipeline subset streams end-to-end.

The full every-edit-type stream (test_all_edit_types.py) takes ~8 min
even warm-cache and lives in the full tier; this picks one type per
mechanism family so the smoke tier still exercises zoo → toolbox →
executor → ledger wiring:

  * remove      — grounding + LaMa inpaint + re-detect verify
  * color_alter — the flagship WYS-IP2P editor
  * replace     — erase + SD-inpaint + verify
  * visual_depth— condition extractor family
"""

import json

import pytest

from anyedit_tpu.cli import tiny_zoo_config
from anyedit_tpu.runtime.executor import ExecutorConfig, FactoryExecutor
from anyedit_tpu.runtime.zoo import ModelZoo, SLOTS_FOR_EDIT_TYPE

from tests.test_all_edit_types import (
    _fallback_result, make_record, scene)

SMOKE_TYPES = ("remove", "color_alter", "replace", "visual_depth")


@pytest.fixture(scope="module")
def smoke_toolbox():
    import numpy as np

    zoo = ModelZoo(tiny_zoo_config())
    slots = sorted({s for t in SMOKE_TYPES for s in SLOTS_FOR_EDIT_TYPE[t]})
    tb = zoo.toolbox(with_diffusion=True, slots=slots)
    real_ground = tb.ground

    def ground(image, phrase, mode="merge", count_k=None):
        g = real_ground(image, phrase, mode=mode, count_k=count_k)
        if g is None or not bool(np.any(np.asarray(g.mask))):
            g = _fallback_result(image)
        return g

    tb.ground = ground
    return tb


def test_smoke_subset_streams(smoke_toolbox, tmp_path):
    records = [make_record(t) for t in SMOKE_TYPES]
    # wiring is under test, not sampler quality: 4-step loops keep this in
    # the smoke budget (full 50-step streams: test_all_edit_types.py)
    real_inpaint = smoke_toolbox.sd_inpaint
    smoke_toolbox.sd_inpaint = (
        lambda img, m, prompt, negative="", **kw:
        real_inpaint(img, m, prompt, negative, steps=4))
    ex = FactoryExecutor(smoke_toolbox, ExecutorConfig(
        output_root=str(tmp_path), run_pre_filter=False,
        run_post_filter=False, ip2p_steps_override=4))
    report = ex.run(records, lambda rec: scene())
    assert sum(report["counts"].values()) == len(records), report

    statuses = {}
    with open(tmp_path / "ledger.jsonl") as f:
        for line in f:
            row = json.loads(line)
            statuses[row["record"]["edit_type"]] = row
    assert set(statuses) == set(SMOKE_TYPES)
    for et, row in statuses.items():
        payload = row.get("payload") or {}
        reason = (payload.get("reason") or "") + " " + (payload.get("error") or "")
        assert "unavailable" not in reason, (et, row["status"], reason)
        assert "error" not in payload, (et, payload)
        assert row["status"] in ("success", "failure"), (et, row["status"])
    # wiring-only types must fully succeed (remove may legitimately fail
    # its gone-after-inpaint verify under the always-detecting fallback)
    for et in ("color_alter", "replace", "visual_depth"):
        assert statuses[et]["status"] == "success", (et, statuses[et])
