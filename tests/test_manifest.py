"""weights/manifest.py — the real-weights proof path stays in lockstep
with the convert registry (VERDICT r4 next #5: a runnable procedure
mirroring the reference's setup.sh:20-118 bootstrap)."""

import shlex

from anyedit_tpu.weights.bootstrap import REGISTRY
from anyedit_tpu.weights.manifest import ASSETS, MANIFEST, emit_plan
from anyedit_tpu.weights.verify import VERIFIERS


def test_manifest_covers_registry_exactly():
    assert set(MANIFEST) == set(REGISTRY), (
        "manifest and convert registry diverged: "
        f"manifest-only={sorted(set(MANIFEST) - set(REGISTRY))} "
        f"registry-only={sorted(set(REGISTRY) - set(MANIFEST))}")
    # every entry names the file/dir the converter reads
    for name, s in MANIFEST.items():
        assert s.src, name
        assert s.hub or s.url or "same download" in s.note, name


def test_plan_is_complete_and_verified_where_possible(capsys):
    from anyedit_tpu.cli import main as cli_main
    assert cli_main(["convert", "--plan", "dl", "--weights-dir", "w"]) == 0
    plan = capsys.readouterr().out
    assert plan.startswith("#!/bin/sh")
    for name in REGISTRY:
        line = [l for l in plan.splitlines()
                if f"--model {name} " in l]
        assert len(line) == 1, name
        # --verify rides along exactly where a torch reference exists
        assert (" --verify" in line[0]) == (name in VERIFIERS), name
        assert f"w/{name}.msgpack" in line[0].replace(shlex.quote(
            f"w/{name}.msgpack"), f"w/{name}.msgpack"), name
    # each hub repo / url fetched once, even when it feeds several slots
    fetches = [l for l in plan.splitlines()
               if l.startswith(("huggingface-cli", "wget"))]
    assert len(fetches) == len(set(fetches))
    anydoor = [l for l in fetches if "anydoor" in l.lower()
               or "8687" in l]
    assert len(anydoor) == 1   # ONE ckpt feeds four conversions
    # tokenizer assets land next to the msgpacks
    for asset in ASSETS:
        assert f"w/{asset}" in plan, asset
    # gated repos route through $HF_TOKEN, everything else must not
    for l in fetches:
        assert ("$HF_TOKEN" in l) == ("meta-llama" in l), l
